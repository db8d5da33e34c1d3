"""Pallas kernel tests (interpret mode on CPU; hardware runs in bench)."""

import jax.numpy as jnp
import numpy as np
import pytest

from slam_rgbd_tpu.features import match as fmatch
from slam_rgbd_tpu.ops import hamming_pallas as hp


class TestHammingTop2:
    def _sets(self, rng, k1=256, k2=384):
        p1 = rng.integers(0, 2**32, size=(k1, 8), dtype=np.uint32)
        p2 = rng.integers(0, 2**32, size=(k2, 8), dtype=np.uint32)
        s1 = fmatch.pack_to_signs(jnp.asarray(p1))
        s2 = fmatch.pack_to_signs(jnp.asarray(p2))
        return s1, s2

    def test_matches_xla_reference(self, rng):
        s1, s2 = self._sets(rng)
        v1 = jnp.ones(s1.shape[0], bool)
        v2 = jnp.ones(s2.shape[0], bool)
        best, second, idx = hp.hamming_top2(s1, v1, s2, v2, interpret=True)
        d = np.asarray(fmatch.hamming_matrix(s1, s2))
        np.testing.assert_array_equal(np.asarray(idx), np.argmin(d, axis=1))
        np.testing.assert_array_equal(np.asarray(best), d.min(axis=1))
        # reference second-best
        d2 = d.copy()
        d2[np.arange(len(d)), np.argmin(d, axis=1)] = 1e9
        np.testing.assert_array_equal(np.asarray(second), d2.min(axis=1))

    def test_validity_masks(self, rng):
        s1, s2 = self._sets(rng, 128, 128)
        v1 = jnp.asarray(rng.random(128) > 0.3)
        v2 = jnp.asarray(rng.random(128) > 0.3)
        best, second, idx = hp.hamming_top2(s1, v1, s2, v2, interpret=True)
        best = np.asarray(best)
        assert np.all(best[~np.asarray(v1)] >= 1e8)
        # valid rows never match invalid columns
        valid_rows = np.asarray(v1) & (best < 1e8)
        assert np.all(np.asarray(v2)[np.asarray(idx)[valid_rows]])

    def test_match_wrapper_agrees(self, rng):
        s1, s2 = self._sets(rng)
        v1 = jnp.ones(s1.shape[0], bool)
        v2 = jnp.ones(s2.shape[0], bool)
        _, idx, best, ok = hp.match_pallas(
            s1, v1, s2, v2, ratio=0.95, cross_check=False, interpret=True
        )
        ref = fmatch.match(s1, v1, s2, v2, ratio=0.95, cross_check=False,
                           backend="xla")
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref.idx2))
        np.testing.assert_array_equal(np.asarray(ok), np.asarray(ref.valid))

    def test_match_wrapper_cross_check(self, rng):
        s1, s2 = self._sets(rng)
        v1 = jnp.asarray(rng.random(s1.shape[0]) > 0.2)
        v2 = jnp.asarray(rng.random(s2.shape[0]) > 0.2)
        _, idx, best, ok = hp.match_pallas(
            s1, v1, s2, v2, ratio=0.95, cross_check=True, interpret=True
        )
        ref = fmatch.match(s1, v1, s2, v2, ratio=0.95, cross_check=True,
                           backend="xla")
        np.testing.assert_array_equal(np.asarray(ok), np.asarray(ref.valid))
        sel = np.asarray(ok)
        np.testing.assert_array_equal(np.asarray(idx)[sel], np.asarray(ref.idx2)[sel])

    def test_match_backend_switch_forced_pallas(self, rng):
        """`features.match.match(backend="pallas")` == XLA path bit-exactly."""
        s1, s2 = self._sets(rng, 128, 256)
        v1 = jnp.ones(128, bool)
        v2 = jnp.ones(256, bool)
        a = fmatch.match(s1, v1, s2, v2, backend="pallas")
        b = fmatch.match(s1, v1, s2, v2, backend="xla")
        np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
        sel = np.asarray(a.valid)
        np.testing.assert_array_equal(np.asarray(a.idx2)[sel], np.asarray(b.idx2)[sel])
        np.testing.assert_array_equal(
            np.asarray(a.distance)[sel], np.asarray(b.distance)[sel]
        )

    def test_shape_guard(self, rng):
        s1, s2 = self._sets(rng, 100, 128)  # 100 not a multiple of 128
        with pytest.raises(AssertionError):
            hp.hamming_top2(s1, jnp.ones(100, bool), s2, jnp.ones(128, bool),
                            interpret=True)


class TestGatedMatch:
    """The fused two-tier map-association kernel vs the XLA reference."""

    def _map_scene(self, rng, K=128, P=256):
        from slam_rgbd_tpu.core.config import CameraIntrinsics, KeyframeConfig
        from slam_rgbd_tpu.mapping import map as smap

        cam = CameraIntrinsics(fx=120.0, fy=120.0, cx=79.5, cy=59.5,
                               width=160, height=120)
        kcfg = KeyframeConfig(max_keyframes=8, max_map_points=P)
        m = smap.empty_map(kcfg, K)
        pts_w = np.stack([
            rng.uniform(-1.5, 1.5, K), rng.uniform(-1.0, 1.0, K),
            rng.uniform(2.0, 4.0, K)], axis=1).astype(np.float32)
        T0 = np.eye(4, dtype=np.float32)
        pc = pts_w  # identity pose: camera == world
        z = pc[:, 2]
        u = cam.fx * pc[:, 0] / z + cam.cx
        v = cam.fy * pc[:, 1] / z + cam.cy
        ok = (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
        uv = np.stack([u, v], 1).astype(np.float32)
        signs = rng.choice([-1, 1], size=(K, 256)).astype(np.int8)
        m = smap.insert_keyframe(
            m, jnp.asarray(T0), 0.0, jnp.asarray(uv), jnp.asarray(pc),
            jnp.asarray(ok), jnp.asarray(signs), jnp.full((K,), -1, jnp.int32),
        )
        return smap, cam, m, uv, pc, ok, signs

    def test_pallas_equals_xla(self, rng):
        smap, cam, m, uv, pc, ok, signs = self._map_scene(rng)
        # perturbed reobservation: some keypoints shift a few px, some get
        # fresh descriptors (unmatched), validity varies
        uv_q = uv + rng.normal(0, 2.0, uv.shape).astype(np.float32)
        z_q = (pc[:, 2] * (1 + rng.normal(0, 0.02, len(pc)))).astype(np.float32)
        kw = dict(
            cam=cam, px_radius=6.0, max_distance=80.0,
            kp_pts=jnp.asarray(pc), merge_radius=0.08,
        )
        a = smap.match_against_map(
            m, jnp.asarray(signs), jnp.asarray(ok), jnp.asarray(uv_q),
            jnp.asarray(z_q), jnp.eye(4), backend="pallas", **kw)
        b = smap.match_against_map(
            m, jnp.asarray(signs), jnp.asarray(ok), jnp.asarray(uv_q),
            jnp.asarray(z_q), jnp.eye(4), backend="xla", **kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert (np.asarray(a) >= 0).sum() > 0.5 * ok.sum()

    def test_pallas_equals_xla_no_merge_tier(self, rng):
        smap, cam, m, uv, pc, ok, signs = self._map_scene(rng)
        a = smap.match_against_map(
            m, jnp.asarray(signs), jnp.asarray(ok), jnp.asarray(uv),
            jnp.asarray(pc[:, 2]), jnp.eye(4), cam=cam, backend="pallas")
        b = smap.match_against_map(
            m, jnp.asarray(signs), jnp.asarray(ok), jnp.asarray(uv),
            jnp.asarray(pc[:, 2]), jnp.eye(4), cam=cam, backend="xla")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_k2_tiling(self, rng):
        """Map capacity above one K2 tile exercises the running-min merge."""
        from slam_rgbd_tpu.ops import hamming_pallas as hp2

        old = hp2._K2_TILE
        hp2._K2_TILE = 128  # force multiple j-steps at P=256
        hp2.gated_match.clear_cache()  # tile size is read at trace time
        try:
            smap, cam, m, uv, pc, ok, signs = self._map_scene(rng)
            a = smap.match_against_map(
                m, jnp.asarray(signs), jnp.asarray(ok), jnp.asarray(uv),
                jnp.asarray(pc[:, 2]), jnp.eye(4), cam=cam, backend="pallas",
                kp_pts=jnp.asarray(pc), merge_radius=0.08)
            b = smap.match_against_map(
                m, jnp.asarray(signs), jnp.asarray(ok), jnp.asarray(uv),
                jnp.asarray(pc[:, 2]), jnp.eye(4), cam=cam, backend="xla",
                kp_pts=jnp.asarray(pc), merge_radius=0.08)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        finally:
            hp2._K2_TILE = old
            hp2.gated_match.clear_cache()
