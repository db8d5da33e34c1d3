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
        idx, best, ok = hp.match_pallas(s1, v1, s2, v2, ratio=0.95, interpret=True)
        ref = fmatch.match(s1, v1, s2, v2, ratio=0.95, cross_check=False)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref.idx2))
        np.testing.assert_array_equal(np.asarray(ok), np.asarray(ref.valid))

    def test_shape_guard(self, rng):
        s1, s2 = self._sets(rng, 100, 128)  # 100 not a multiple of 128
        with pytest.raises(AssertionError):
            hp.hamming_top2(s1, jnp.ones(100, bool), s2, jnp.ones(128, bool),
                            interpret=True)
