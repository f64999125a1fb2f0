"""Native C++ packer: byte-identical to the numpy path, graceful fallback."""

import numpy as np
import pytest

from mmdfn_tpu.data import _native
from mmdfn_tpu.data.batching import _pack_numpy


def test_native_builds_and_loads():
    assert _native.available(), "g++ is in this image; the build must work"


def test_pack_f32_matches_numpy(rng):
    B, L, D = 6, 12, 7
    arrs = [rng.standard_normal((int(n), D)).astype(np.float32)
            for n in rng.integers(1, L + 1, size=4)]
    expected = _pack_numpy(arrs, B, L, D)
    got = _native.pack_f32(arrs, B, L, D)
    np.testing.assert_array_equal(got, expected)


def test_pack_f32_noncontiguous_input(rng):
    B, L, D = 3, 8, 5
    big = rng.standard_normal((8, 2 * D)).astype(np.float32)
    arrs = [big[:4, ::2]]                      # non-contiguous view
    expected = _pack_numpy([np.ascontiguousarray(arrs[0])], B, L, D)
    got = _native.pack_f32(arrs, B, L, D)
    np.testing.assert_array_equal(got, expected)


def test_pack_masks_labels(rng):
    B, L = 5, 10
    labels = [rng.integers(0, 6, size=int(n)).astype(np.int32)
              for n in (3, 10, 1)]
    umask, out = _native.pack_masks_labels(labels, B, L)
    for i, lab in enumerate(labels):
        n = len(lab)
        np.testing.assert_array_equal(out[i, :n], lab)
        assert umask[i, :n].all() and not umask[i, n:].any()
        assert (out[i, n:] == 0).all()
    assert not umask[3:].any()


def test_collate_uses_native_and_matches_disabled(rng, monkeypatch, tmp_path):
    from mmdfn_tpu.data.batching import collate
    from mmdfn_tpu.data.datasets import Dialogue

    def make(n):
        return Dialogue(
            vid=f"d{n}",
            text=rng.standard_normal((n, 4)).astype(np.float32),
            visual=rng.standard_normal((n, 3)).astype(np.float32),
            audio=rng.standard_normal((n, 5)).astype(np.float32),
            qmask=np.eye(2, dtype=np.float32)[rng.integers(0, 2, n)],
            label=rng.integers(0, 6, n).astype(np.int32))

    ds = [make(4), make(7), make(2)]
    b_native = collate(ds, batch_size=4, bucket=8, n_speakers=2)

    monkeypatch.setattr(_native, "_lib", None)
    monkeypatch.setattr(_native, "_tried", True)   # force numpy fallback
    b_numpy = collate(ds, batch_size=4, bucket=8, n_speakers=2)
    for field in ("text", "visual", "audio", "qmask", "umask", "label"):
        np.testing.assert_array_equal(getattr(b_native, field),
                                      getattr(b_numpy, field))


def test_pack_f32_rejects_out_of_bounds(rng):
    B, L, D = 4, 8, 5
    too_long = [rng.standard_normal((L + 1, D)).astype(np.float32)]
    with pytest.raises(ValueError, match="exceeds bucket"):
        _native.pack_f32(too_long, B, L, D)
    wrong_dim = [rng.standard_normal((3, D + 2)).astype(np.float32)]
    with pytest.raises(ValueError, match="expected"):
        _native.pack_f32(wrong_dim, B, L, D)
    too_many = [rng.standard_normal((2, D)).astype(np.float32)
                for _ in range(B + 1)]
    with pytest.raises(ValueError, match="exceed batch"):
        _native.pack_f32(too_many, B, L, D)


def test_pack_masks_labels_rejects_out_of_bounds(rng):
    B, L = 3, 6
    with pytest.raises(ValueError, match="exceeds bucket"):
        _native.pack_masks_labels([np.zeros(L + 2, np.int32)], B, L)
    with pytest.raises(ValueError, match="exceed batch"):
        _native.pack_masks_labels([np.zeros(2, np.int32)] * (B + 1), B, L)
