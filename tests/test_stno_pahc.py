"""STNO conditioning masks + PAHC merge tests."""

import numpy as np
import pytest

from speaker_diarization_tpu.data.rttm import Turn
from speaker_diarization_tpu.infer.clustering import pahc_merge
from speaker_diarization_tpu.postproc.stno import diarization_mask, stno_mask, stno_masks_for_all


class TestSTNO:
    def test_partition(self):
        # spk0: frames 0-4; spk1: frames 3-7 → overlap at 3-4
        M = np.zeros((2, 10), np.float32)
        M[0, 0:5] = 1
        M[1, 3:8] = 1
        s = stno_mask(M, 0)
        assert s.shape == (4, 10)
        np.testing.assert_allclose(s.sum(axis=0), 1.0)  # exact partition
        np.testing.assert_array_equal(np.nonzero(s[1])[0], [0, 1, 2])  # target-only
        np.testing.assert_array_equal(np.nonzero(s[3])[0], [3, 4])  # overlap
        np.testing.assert_array_equal(np.nonzero(s[2])[0], [5, 6, 7])  # non-target
        np.testing.assert_array_equal(np.nonzero(s[0])[0], [8, 9])  # silence

    def test_from_turns(self):
        turns = [Turn("r", 0.0, 0.1, "A"), Turn("r", 0.06, 0.1, "B")]
        M = diarization_mask(turns, ["A", "B"], 10, frame_rate=50)
        assert M.shape == (2, 10)
        assert M[0, 0] == 1 and M[1, 3] == 1
        all_masks = stno_masks_for_all(M)
        assert all_masks.shape == (2, 4, 10)

    def test_single_speaker(self):
        M = np.zeros((1, 5), np.float32)
        M[0, 1:3] = 1
        s = stno_mask(M, 0)
        np.testing.assert_array_equal(np.nonzero(s[1])[0], [1, 2])
        assert s[3].sum() == 0  # no overlap possible


class TestPAHC:
    def test_merges_close_clusters(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((10, 8)) * 0.01 + np.array([1.0] * 4 + [0.0] * 4)
        b = a + 0.005  # nearly identical cluster, different label
        c = rng.standard_normal((10, 8)) * 0.01 + np.array([0.0] * 4 + [-1.0] * 4)
        X = np.concatenate([a, b, c])
        labels = np.array([0] * 10 + [1] * 10 + [2] * 10)
        out = pahc_merge(X, labels, merge_threshold=0.9)
        assert out[0] == out[10]  # a and b merged
        assert out[0] != out[20]
        assert len(np.unique(out)) == 2

    def test_absorbs_tiny_cluster(self):
        rng = np.random.default_rng(1)
        big = rng.standard_normal((30, 8)) * 0.01 + 1.0
        tiny = rng.standard_normal((2, 8)) * 0.01 + 1.1  # near `big`
        far = rng.standard_normal((30, 8)) * 0.01 - 1.0
        X = np.concatenate([big, tiny, far])
        labels = np.array([0] * 30 + [1] * 2 + [2] * 30)
        out = pahc_merge(X, labels, merge_threshold=0.999, min_cluster_frac=0.2)
        assert out[30] == out[0]  # tiny absorbed into big
        assert len(np.unique(out)) == 2
