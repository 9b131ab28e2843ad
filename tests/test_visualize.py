"""PLY prediction-dump utility: binary layout parses back exactly."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def test_write_ply_roundtrip(tmp_path):
    from scripts.visualize import _PALETTE, labels_to_colors, write_ply

    rng = np.random.default_rng(0)
    xyz = rng.uniform(-3, 3, (500, 3)).astype(np.float32)
    labels = rng.integers(0, 25, 500)          # exercises palette cycling
    colors = labels_to_colors(labels)
    assert colors.dtype == np.uint8 and colors.shape == (500, 3)
    sel = colors[labels == 22]
    np.testing.assert_array_equal(
        sel, np.tile(_PALETTE[22 % len(_PALETTE)], (len(sel), 1)))

    path = str(tmp_path / "out.ply")
    write_ply(path, xyz, colors)
    raw = open(path, "rb").read()
    header, body = raw.split(b"end_header\n", 1)
    lines = header.decode("ascii").splitlines()
    assert lines[0] == "ply" and "element vertex 500" in lines
    rec = np.frombuffer(body, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
    assert len(rec) == 500
    np.testing.assert_array_equal(rec["xyz"], xyz)
    np.testing.assert_array_equal(rec["rgb"], colors)
