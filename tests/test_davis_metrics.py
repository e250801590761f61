"""DAVIS J&F validation on hand-computable adversarial fixtures.

VERDICT.md round-1 item 4: the in-repo J&F (videowalk_tpu/eval/davis_metrics)
must carry the *official* davis2017-evaluation semantics — seg2bmap boundary
definition (E/S/SE transition marks, background-side pixels included),
disk-dilated tolerance matching, per-object-track global aggregation — pinned
here to hand-enumerated values on thin structures and 1-px offsets.
"""

import os

import numpy as np
import pytest

from videowalk_tpu.eval.davis_metrics import (evaluate_davis,
                                              evaluate_sequence, f_measure,
                                              jaccard, seg2bmap)

Image = pytest.importorskip("PIL.Image")


# ------------------------------------------------------------- seg2bmap


def test_seg2bmap_single_pixel():
    """One fg pixel at (5,5): official boundary marks the 2x2 block whose
    E/S/SE comparisons cross the pixel — {(5,5),(4,5),(5,4),(4,4)}."""
    seg = np.zeros((20, 20), bool)
    seg[5, 5] = True
    b = seg2bmap(seg)
    expected = {(5, 5), (4, 5), (5, 4), (4, 4)}
    assert set(zip(*np.nonzero(b))) == expected


def test_seg2bmap_3x3_block_hand_enumerated():
    """3x3 block at rows/cols 4..6 of a 12x12 grid: boundary = the block's
    bottom row + right column (fg side) plus the background row/col 3
    adjacent on the north/west (12 pixels total)."""
    seg = np.zeros((12, 12), bool)
    seg[4:7, 4:7] = True
    b = seg2bmap(seg)
    expected = {
        (6, 4), (6, 5), (6, 6),          # block bottom row
        (4, 6), (5, 6),                  # block right column
        (3, 3), (3, 4), (3, 5), (3, 6),  # background row north
        (4, 3), (5, 3), (6, 3),          # background col west
    }
    assert set(zip(*np.nonzero(b))) == expected


def test_seg2bmap_interior_not_boundary():
    seg = np.zeros((16, 16), bool)
    seg[4:12, 4:12] = True
    b = seg2bmap(seg)
    assert not b[7, 7] and not b[8, 8]


def test_seg2bmap_full_frame_object():
    """Object covering the whole frame has no E/S/SE transitions -> empty
    boundary (the official corner special-case)."""
    seg = np.ones((8, 8), bool)
    assert seg2bmap(seg).sum() == 0


# ------------------------------------------------------------- f_measure


def _pixel_mask(h, w, yx):
    m = np.zeros((h, w), bool)
    m[yx] = True
    return m


def test_f_measure_one_pixel_shift_within_tolerance():
    """20x20 grid: bound_pix = ceil(0.008 * sqrt(800)) = 1; a 1-px offset is
    fully matched by the disk(1) dilation -> F = 1."""
    gt = _pixel_mask(20, 20, (5, 5))
    pred = _pixel_mask(20, 20, (5, 6))
    assert f_measure(pred, gt) == 1.0


def test_f_measure_three_pixel_shift_outside_tolerance():
    """Same grid, 3-px offset: every pred boundary pixel is > 1 px from every
    gt boundary pixel -> precision = recall = 0 -> F = 0."""
    gt = _pixel_mask(20, 20, (5, 5))
    pred = _pixel_mask(20, 20, (5, 8))
    assert f_measure(pred, gt) == 0.0


def test_f_measure_thin_line_vs_thick_line_hand_computed():
    """gt = 1-px vertical line (col 8), pred = 3-px thick line (cols 7..9) on
    a 24x24 grid (bound_pix = 1).

    pred boundary: cols 6 and 9 (plus se-corner effects are absent for full-
    height lines except the last-row rule); gt boundary: cols 7 and 8.
    Column 6 is 1 px from col 7 (matched), col 9 is 1 px from col 8
    (matched) -> precision 1; gt cols 7, 8 are within 1 px of pred cols
    6/9? col 7 ~ col 6 (1 px) matched; col 8 ~ col 9 (1 px) matched ->
    recall 1 -> F = 1."""
    gt = np.zeros((24, 24), bool)
    gt[:, 8] = True
    pred = np.zeros((24, 24), bool)
    pred[:, 7:10] = True
    assert f_measure(pred, gt) == 1.0


def test_f_measure_empty_cases():
    empty = np.zeros((16, 16), bool)
    blob = _pixel_mask(16, 16, (8, 8))
    assert f_measure(empty, empty) == 1.0    # official: P=R=1
    assert f_measure(blob, empty) == 0.0     # P=0, R=1 -> F=0
    assert f_measure(empty, blob) == 0.0     # P=1, R=0 -> F=0


def test_jaccard_cases():
    empty = np.zeros((8, 8), bool)
    a = np.zeros((8, 8), bool)
    a[2:6, 2:6] = True
    b = np.zeros((8, 8), bool)
    b[4:8, 4:8] = True
    assert jaccard(empty, empty) == 1.0
    assert jaccard(a, a) == 1.0
    np.testing.assert_allclose(jaccard(a, b), 4.0 / 28.0)


# ------------------------------------------ aggregation (per object track)


def _write_seq(root, name, frames):
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    for i, m in enumerate(frames):
        Image.fromarray(m.astype(np.uint8)).save(
            os.path.join(d, f"{i:05d}.png"))


def test_global_mean_is_per_object_track(tmp_path):
    """Official aggregation: J-Mean averages over all (sequence, object)
    pairs. seq A has 1 object (J=1), seq B has 2 objects (J=1 and J=0):
    per-track mean = 2/3, NOT the per-sequence mean (1 + 0.5)/2 = 0.75."""
    davis = tmp_path / "DAVIS"
    ann = davis / "Annotations" / "480p"
    res = tmp_path / "results"
    os.makedirs(davis / "ImageSets" / "2017", exist_ok=True)
    with open(davis / "ImageSets" / "2017" / "val.txt", "w") as f:
        f.write("seqA\nseqB\n")

    # seqA: one object, predictions perfect
    a = np.zeros((16, 16), np.uint8)
    a[2:6, 2:6] = 1
    _write_seq(str(ann), "seqA", [a] * 4)
    _write_seq(str(res), "seqA", [a] * 4)

    # seqB: two objects; object 1 predicted perfectly, object 2 missed
    b = np.zeros((16, 16), np.uint8)
    b[2:6, 2:6] = 1
    b[10:14, 10:14] = 2
    b_pred = np.where(b == 2, 0, b).astype(np.uint8)
    _write_seq(str(ann), "seqB", [b] * 4)
    _write_seq(str(res), "seqB", [b_pred] * 4)

    out = evaluate_davis(str(res), str(davis))
    np.testing.assert_allclose(out["J-Mean"], 2.0 / 3.0)


def test_evaluate_sequence_excludes_first_and_last_frame(tmp_path):
    """Only frames 1..N-2 are scored (semi-supervised protocol): perfect
    middle frames with wrong first/last frames still score J=1."""
    ann = tmp_path / "ann"
    res = tmp_path / "res"
    m = np.zeros((16, 16), np.uint8)
    m[4:8, 4:8] = 1
    wrong = np.zeros_like(m)
    _write_seq(str(tmp_path), "ann", [m, m, m, m])
    _write_seq(str(tmp_path), "res", [wrong, m, m, wrong])
    per_obj = evaluate_sequence(str(res), str(ann))
    assert per_obj[1]["J"] == 1.0 and per_obj[1]["F"] == 1.0
