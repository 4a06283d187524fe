import numpy as np

from pctpu.ops.select import greedy_keyframe_mask, keyframe_labels, select_major_frames


def line_positions(n, spacing):
    pos = np.zeros((n, 3), np.float32)
    pos[:, 0] = np.arange(n) * spacing
    return pos


def test_greedy_gate_keeps_first_frame():
    keep = greedy_keyframe_mask(line_positions(5, 0.5), interval=2.0)
    assert keep[0]
    # 0.5 m spacing: every 4th frame after the first
    np.testing.assert_array_equal(keep, [True, False, False, False, True])


def test_greedy_gate_all_when_spacing_exceeds():
    keep = greedy_keyframe_mask(line_positions(4, 3.0), interval=2.0)
    assert keep.all()


def test_major_frames_interval():
    # 5 m spacing, 20 m interval → majors at 0, 4, 8, ...
    majors = select_major_frames(line_positions(13, 5.0))
    assert majors == [0, 4, 8, 12]


def test_major_frames_revisit_rejected():
    # a loop: goes out 30 m and returns to the start — the revisit is >20 m
    # from the previous major but <20 m from major 0 → rejected (1-NN check)
    pos = np.array(
        [[0, 0, 0], [30, 0, 0], [60, 0, 0], [30.5, 0.2, 0], [2, 0, 0]],
        np.float32,
    )
    majors = select_major_frames(pos)
    assert 4 not in majors  # frame 4 is 2 m from major 0
    assert 3 not in majors  # frame 3 is 0.54 m from major 1


def test_labels_major_is_one_hot():
    pos = line_positions(9, 5.0)
    majors = select_major_frames(pos)  # [0, 4, 8]
    labels = keyframe_labels(pos, majors)
    assert labels.shape == (9, 3)
    for col, m in enumerate(majors):
        assert labels[m, col] == 1.0
        assert labels[m].sum() == 1.0


def test_labels_interpolation_weights():
    pos = line_positions(9, 5.0)
    majors = select_major_frames(pos)  # majors at x = 0, 20, 40
    labels = keyframe_labels(pos, majors)
    # frame 1 at x=5: d² to majors = 25, 225 → w ∝ 1/25.00001, 1/225.00001
    w0 = 1.0 / (25.0 + 1e-5)
    w1 = 1.0 / (225.0 + 1e-5)
    np.testing.assert_allclose(labels[1, 0], w0 / (w0 + w1), rtol=1e-6)
    np.testing.assert_allclose(labels[1, 1], w1 / (w0 + w1), rtol=1e-6)
    np.testing.assert_allclose(labels.sum(axis=1), 1.0, rtol=1e-6)


def test_labels_single_major():
    pos = line_positions(3, 1.0)  # all within 20 m → one major
    majors = select_major_frames(pos)
    assert majors == [0]
    labels = keyframe_labels(pos, majors)
    np.testing.assert_array_equal(labels, [[1.0], [1.0], [1.0]])


def test_keyframe_labels_empty_majors():
    import numpy as np

    from pctpu.ops.select import keyframe_labels

    out = keyframe_labels(np.random.rand(4, 3).astype(np.float32), [])
    assert out.shape == (4, 0)
