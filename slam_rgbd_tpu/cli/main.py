"""Command-line interface — the reference's interactive menu as verbs.

`Youth.Source/main.c:57-159` drives everything through a stdin menu
(record / stop / playback / quit); here the same capabilities are explicit
subcommands plus the evaluation and benchmark tooling the reference lacks:

    python -m slam_rgbd_tpu run       # SLAM over a dataset/recording/synthetic
    python -m slam_rgbd_tpu record    # capture a source to a .rgbd file
    python -m slam_rgbd_tpu play      # replay a recording through SLAM
    python -m slam_rgbd_tpu eval      # ATE/RPE of a trajectory vs ground truth
    python -m slam_rgbd_tpu export    # recording/map -> PLY point cloud
    python -m slam_rgbd_tpu serve     # web point-cloud viewer
    python -m slam_rgbd_tpu benchmark # tracking throughput (bench.py metric)
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

import numpy as np


def _load_config(args):
    from slam_rgbd_tpu.core.config import SLAMConfig, astra_default_config, tum_fr1_config

    if args.config:
        return SLAMConfig.from_yaml(args.config)
    if getattr(args, "tum", None):
        return tum_fr1_config()
    return astra_default_config()


def _make_source(args, cfg):
    """Resolve the frame source: TUM dir, .rgbd recording, or synthetic."""
    from slam_rgbd_tpu.io import stream as st

    if args.input and os.path.isdir(args.input):
        import glob

        if not os.path.exists(os.path.join(args.input, "depth.txt")) and glob.glob(
            os.path.join(args.input, "*.depth")
        ):
            from slam_rgbd_tpu.io.icl_nuim import ICLNUIMSequence

            seq = ICLNUIMSequence(args.input, cfg.camera)
            return seq, seq.groundtruth()
        from slam_rgbd_tpu.io.tum import TUMSequence

        seq = TUMSequence(args.input, cfg.camera)
        return seq, seq.groundtruth()
    if args.input and args.input.endswith(".rgbd"):
        return st.open_reader(args.input, prefetch=cfg.stream.prefetch), None
    if args.input and args.input.startswith("synthetic"):
        from slam_rgbd_tpu.io.synthetic import SyntheticSequence

        n = int(args.input.split(":")[1]) if ":" in args.input else 100
        seq = SyntheticSequence(n, cfg.camera)
        return seq, seq.groundtruth()
    if args.input and args.input.startswith("grabber:"):
        # live-hardware adapter by dotted path ("grabber:pkg.mod:factory")
        # — the pluggable Astra-wrapper boundary (io/grabber.py); the
        # factory returns a FrameGrabber over the vendor SDK
        from slam_rgbd_tpu.io.grabber import GrabberSource, resolve_grabber

        factory = resolve_grabber(args.input[len("grabber:"):])
        return GrabberSource(factory, stream_cfg=cfg.stream), None
    raise SystemExit(
        f"unrecognized input {args.input!r}: expected a TUM directory, a "
        f".rgbd recording, 'synthetic[:N]', or 'grabber:module:factory'"
    )


def cmd_run(args):
    cfg = _load_config(args)
    src, gt = _make_source(args, cfg)
    from slam_rgbd_tpu.io import stream as st
    from slam_rgbd_tpu.runtime.runner import PipelineRunner

    runner = PipelineRunner(cfg, iter(src))
    if args.record:
        runner.control.send(st.ControlCommand.START_RECORD, args.record)
        runner._handle_control()
    if getattr(args, "interactive", False):
        from slam_rgbd_tpu.runtime.runner import ControlMenu

        ControlMenu(runner).start()  # stdin menu, main.c:57-159 parity
        args.threaded = True  # the menu requires the threaded pipeline
    server = None
    if getattr(args, "serve", None) is not None:
        # LIVE sensor->SLAM->viewer loop as one command — the reference's
        # flagship camera->hub->viewer pipeline (`main.c:263-299`), with
        # the viewer fed from the RUNNING session's map: the server's
        # source callable re-reads `runner.session.map` per request
        # (immutable pytree — a reference grab is snapshot-consistent).
        from slam_rgbd_tpu.viz.pointcloud import map_to_pointcloud
        from slam_rgbd_tpu.viz.server import PointCloudServer

        server = PointCloudServer(
            lambda: map_to_pointcloud(runner.session.map),
            port=args.serve,
        ).start()
        print(f"live viewer at http://{server.host}:{server.port}/ "
              f"(/native for the C++ rasterizer)")
    try:
        session = runner.run(threads=args.threaded)
    finally:
        if server is not None:
            server.stop()
    if args.record and runner.recorder:
        runner.recorder.close()

    # end-of-sequence backend coverage before any export (SLAM.cpp:177-198
    # saves through a final optimization on shutdown)
    session.sync_backend(final_pass=True)
    print(f"frames={session.state.frames} keyframes={session.state.keyframes} "
          f"map_points={session.map_point_count()} loops={session.state.loops} "
          f"lost={session.state.lost}")
    if args.traj:
        session.save_trajectory(args.traj)
        print(f"trajectory -> {args.traj}")
    if args.kf_traj:
        session.save_keyframe_trajectory(args.kf_traj)
    if args.checkpoint:
        from slam_rgbd_tpu.runtime import checkpoint

        checkpoint.save(session, args.checkpoint)
        print(f"checkpoint -> {args.checkpoint}")
    if gt is not None and args.traj:
        from slam_rgbd_tpu.eval.trajectory import ate_rmse

        _, est = session.poses()
        rmse, _, _ = ate_rmse(est, gt[: len(est)])
        print(f"ATE RMSE vs ground truth: {rmse * 100:.2f} cm")
    return 0


def cmd_record(args):
    cfg = _load_config(args)
    src, _ = _make_source(args, cfg)
    from slam_rgbd_tpu.io import stream as st

    n = 0
    rec = st.open_recorder(args.output)
    with rec:
        for ts, d, c in st.paced(iter(src), args.fps):
            rec.write(ts, d, c)
            n += 1
            if args.frames and n >= args.frames:
                break
    print(f"recorded {n} frames -> {args.output}")
    return 0


def cmd_play(args):
    args.input = args.recording
    args.record = None
    return cmd_run(args)


def cmd_eval(args):
    from slam_rgbd_tpu.eval.trajectory import ate_rmse, load_trajectory_tum, rpe

    ts_e, est = load_trajectory_tum(args.estimate)
    ts_g, gt = load_trajectory_tum(args.groundtruth)
    # associate by nearest timestamp
    idx = np.argmin(np.abs(ts_g[None, :] - ts_e[:, None]), axis=1)
    gt_assoc = gt[idx]
    rmse, _, _ = ate_rmse(est, gt_assoc)
    t_rpe, r_rpe = rpe(est, gt_assoc)
    out = {
        "ate_rmse_m": round(rmse, 5),
        "rpe_trans_m": round(t_rpe, 5),
        "rpe_rot_deg": round(float(np.rad2deg(r_rpe)), 4),
        "frames": len(est),
    }
    print(json.dumps(out))
    return 0


def cmd_export(args):
    cfg = _load_config(args)
    from slam_rgbd_tpu.viz.pointcloud import frame_to_pointcloud, save_ply

    src, _ = _make_source(args, cfg)
    it = iter(src)
    for _ in range(args.frame):
        next(it)
    ts, depth, rgb = next(it)
    pts, colors = frame_to_pointcloud(depth, rgb, cfg.camera, stride=args.stride)
    if args.output.endswith(".ppm"):
        # rendered snapshot via the native software viewer (C6/C10 parity)
        from slam_rgbd_tpu.viz.native import NativeViewer, native_available

        if not native_available():
            raise SystemExit("native viewer unavailable (g++/make missing?)")
        with NativeViewer() as vw:
            vw.set_target(0.0, 0.0, float(np.median(pts[:, 2])))
            vw.write_ppm(args.output, vw.render(pts, colors))
        print(f"{len(pts)} points rendered -> {args.output}")
        return 0
    save_ply(args.output, pts, colors)
    print(f"{len(pts)} points -> {args.output}")
    return 0


def cmd_serve(args):
    cfg = _load_config(args)
    from slam_rgbd_tpu.viz.pointcloud import frame_to_pointcloud
    from slam_rgbd_tpu.viz.server import PointCloudServer

    src, _ = _make_source(args, cfg)
    frames = []
    for i, f in enumerate(iter(src)):
        frames.append(f)
        if i >= args.frame:
            break
    ts, depth, rgb = frames[min(args.frame, len(frames) - 1)]

    def source():
        return frame_to_pointcloud(depth, rgb, cfg.camera, stride=2)

    server = PointCloudServer(source, port=args.port).start()
    print(f"viewer at http://{server.host}:{server.port}/ — Ctrl-C to stop")
    try:
        import time

        while True:
            time.sleep(1)
    except KeyboardInterrupt:
        server.stop()
    return 0


def cmd_benchmark(args):
    if args.scaling:
        from slam_rgbd_tpu.parallel.scaling import scaling_report

        rep = scaling_report(iters=args.iters, width=args.width,
                             height=args.height)
        out = json.dumps(rep, indent=1)
        if args.out:
            with open(args.out, "w") as f:
                f.write(out + "\n")
            print(f"scaling report -> {args.out}")
        print(out)
        return 0
    from slam_rgbd_tpu import benchmarks

    benchmarks.main()
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="slam_rgbd_tpu", description=__doc__)
    p.add_argument("--config", help="SLAMConfig YAML path")
    p.add_argument("-v", "--verbose", action="store_true")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="run SLAM over a source")
    pr.add_argument("input", help="TUM dir | .rgbd recording | synthetic[:N]")
    pr.add_argument("--tum", action="store_true", help="use TUM fr1 intrinsics")
    pr.add_argument("--traj", help="write TUM trajectory here")
    pr.add_argument("--kf-traj", help="write keyframe trajectory here")
    pr.add_argument("--record", help="tee frames to a .rgbd recording")
    pr.add_argument("--checkpoint", help="save final state here")
    pr.add_argument("--threaded", action="store_true", help="producer/consumer pipeline")
    pr.add_argument("--interactive", action="store_true",
                    help="stdin control menu (record/playback/reset/quit)")
    pr.add_argument("--serve", type=int, default=None, metavar="PORT",
                    help="serve the RUNNING session's map live "
                         "(web + native viewer; 0 = ephemeral port)")
    pr.set_defaults(fn=cmd_run)

    pc = sub.add_parser("record", help="capture a source to .rgbd")
    pc.add_argument("input")
    pc.add_argument("output")
    pc.add_argument("--fps", type=float, default=0.0, help="pace (0 = max rate)")
    pc.add_argument("--frames", type=int, default=0)
    pc.add_argument("--tum", action="store_true")
    pc.set_defaults(fn=cmd_record)

    pp = sub.add_parser("play", help="replay a recording through SLAM")
    pp.add_argument("recording")
    pp.add_argument("--tum", action="store_true")
    pp.add_argument("--traj")
    pp.add_argument("--kf-traj")
    pp.add_argument("--checkpoint")
    pp.add_argument("--threaded", action="store_true")
    pp.set_defaults(fn=cmd_play)

    pe = sub.add_parser("eval", help="ATE/RPE of trajectory vs ground truth")
    pe.add_argument("estimate")
    pe.add_argument("groundtruth")
    pe.set_defaults(fn=cmd_eval)

    px = sub.add_parser("export", help="export a frame: .ply point cloud or .ppm render")
    px.add_argument("input")
    px.add_argument("output")
    px.add_argument("--frame", type=int, default=0)
    px.add_argument("--stride", type=int, default=1)
    px.add_argument("--tum", action="store_true")
    px.set_defaults(fn=cmd_export)

    ps = sub.add_parser("serve", help="web point-cloud viewer")
    ps.add_argument("input")
    ps.add_argument("--frame", type=int, default=0)
    ps.add_argument("--port", type=int, default=8080)
    ps.add_argument("--tum", action="store_true")
    ps.set_defaults(fn=cmd_serve)

    pb = sub.add_parser("benchmark", help="throughput / scaling benchmarks")
    pb.add_argument("--scaling", action="store_true",
                    help="frames/s vs mesh size (BASELINE.md scaling metric)")
    pb.add_argument("--iters", type=int, default=10)
    pb.add_argument("--width", type=int, default=0)
    pb.add_argument("--height", type=int, default=0)
    pb.add_argument("--out", help="write the scaling JSON artifact here")
    pb.set_defaults(fn=cmd_benchmark)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
