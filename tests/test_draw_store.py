"""Native C++ draw store: round trip, crash recovery, format parity."""

import os

import numpy as np
import pytest

from math_tpu.io import draw_store as ds


def test_native_library_builds():
    assert ds.native_available(), "g++ build of native/draw_store.cc failed"


def test_round_trip(tmp_path):
    path = str(tmp_path / "draws.mtds")
    rng = np.random.default_rng(0)
    a = rng.normal(size=(10, 4, 3)).astype(np.float32)
    b = rng.normal(size=(5, 4, 3)).astype(np.float32)
    with ds.DrawStore(path, 4, 3, np.float32) as w:
        w.append(a)
        w.append(b)
    out = ds.read_draws(path)
    np.testing.assert_array_equal(out, np.concatenate([a, b], axis=0))


def test_append_reopen(tmp_path):
    path = str(tmp_path / "draws.mtds")
    a = np.ones((3, 2, 2), np.float64)
    with ds.DrawStore(path, 2, 2, np.float64) as w:
        w.append(a)
    with ds.DrawStore(path, 2, 2, np.float64) as w:
        w.append(2 * a)
    out = ds.read_draws(path)
    assert out.shape == (6, 2, 2)
    assert out.dtype == np.float64
    np.testing.assert_array_equal(out[3:], 2 * a)


def test_torn_record_recovery(tmp_path):
    """A crash mid-write must not lose earlier chunks."""
    path = str(tmp_path / "draws.mtds")
    a = np.full((4, 2, 2), 7.0, np.float32)
    with ds.DrawStore(path, 2, 2, np.float32) as w:
        w.append(a)
    # simulate torn final record: header says 10 draws, payload truncated
    with open(path, "ab") as f:
        f.write(np.uint64(10).tobytes())
        f.write(b"\x00" * 13)
    out = ds.read_draws(path)
    np.testing.assert_array_equal(out, a)


def test_corrupt_crc_dropped(tmp_path):
    path = str(tmp_path / "draws.mtds")
    a = np.full((2, 1, 2), 1.0, np.float32)
    with ds.DrawStore(path, 1, 2, np.float32) as w:
        w.append(a)
        w.append(3 * a)
    # flip a payload byte in the second record
    size = os.path.getsize(path)
    with open(path, "r+b") as f:
        f.seek(size - 8)
        f.write(b"\xff")
    out = ds.read_draws(path)
    np.testing.assert_array_equal(out, a)  # only first chunk survives


def test_shape_validation(tmp_path):
    path = str(tmp_path / "draws.mtds")
    with ds.DrawStore(path, 2, 3) as w:
        with pytest.raises(ValueError):
            w.append(np.zeros((1, 3, 2)))


def test_python_fallback_format_parity(tmp_path, monkeypatch):
    """Files written natively must read via the numpy fallback and v.v."""
    path1 = str(tmp_path / "n.mtds")
    a = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    with ds.DrawStore(path1, 3, 4, np.float32) as w:
        w.append(a)
    monkeypatch.setattr(ds, "_lib", None)
    out = ds.read_draws(path1)
    np.testing.assert_array_equal(out, a)
    path2 = str(tmp_path / "p.mtds")
    with ds.DrawStore(path2, 3, 4, np.float32) as w:
        w.append(a)
    monkeypatch.undo()
    out2 = ds.read_draws(path2)
    np.testing.assert_array_equal(out2, a)
