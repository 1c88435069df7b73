"""Literal viz oracle (data_utils/draw_3d_joints.py): the reference's
matplotlib hand plot rendered pixel-for-pixel against ours.

Both sides draw on identical fresh figures; since the bone topology,
per-finger colors, marker sizes and line widths must agree, the
rasterized RGB buffers are compared exactly.
"""

import numpy as np
import pytest

import literal_ref


@pytest.fixture(scope="module")
def ldraw():
    mod = literal_ref.load("data_utils.draw_3d_joints")
    pytest.importorskip("matplotlib")
    import matplotlib
    matplotlib.use("Agg")
    return mod


def _render(plot_fn, coords, **kw):
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(2, 2), dpi=100)
    ax = fig.add_subplot(111)
    ax.set_xlim(0, 64)
    ax.set_ylim(0, 64)
    plot_fn(ax, coords, **kw)
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return buf


def test_literal_constants(ldraw):
    from scat_tpu.viz import draw
    np.testing.assert_array_equal(draw.color_hand_joints,
                                  ldraw.color_hand_joints)


def test_literal_plot_2d_hand_pixels(ldraw):
    from scat_tpu.viz import draw
    r = np.random.RandomState(0)
    coords_hw = (r.rand(21, 2) * 56 + 4).astype(np.float64)
    lit = _render(ldraw.plot_2d_hand, coords_hw.copy(), draw_kp=True)
    ours = _render(draw.plot_2d_hand, coords_hw.copy(), draw_kp=True)
    np.testing.assert_array_equal(ours, lit)
    # and with a visibility mask (the literal's color_fixed branch
    # passes the color as a positional matplotlib format arg,
    # draw_3d_joints.py:87 — a string color exercises both forms)
    vis = np.array([True] * 15 + [False] * 6)
    lit2 = _render(ldraw.plot_2d_hand, coords_hw.copy(), vis=vis,
                   color_fixed="r")
    ours2 = _render(draw.plot_2d_hand, coords_hw.copy(), vis=vis,
                    color_fixed="r")
    np.testing.assert_array_equal(ours2, lit2)
