"""Animated GIF decode (kernel/imgcodec.gif_animation): disposal
semantics, transparency, NETSCAPE loop count, budgets, and the
never-raises posture under mutation.  Fixtures come from the
module's own encode_gif_animation; expected composites are computed
by independent numpy arithmetic, never by re-running the decoder."""

from __future__ import annotations

import random

import numpy as np
import pytest

from pdf_to_text_extraction_service_spark.kernel import imgcodec as ic


def test_flat_frames_roundtrip_and_metadata():
    f0 = np.full((10, 12), 40, np.uint8)
    f1 = np.full((10, 12), 90, np.uint8)
    gif = ic.encode_gif_animation([f0, f1], [10, 25], loop=7)
    frames, delays, loop = ic.gif_animation(gif)
    assert len(frames) == 2 and delays == [10, 25] and loop == 7
    assert (frames[0] == 40).all() and (frames[1] == 90).all()
    assert frames[0].shape == (10, 12, 3)


def test_no_netscape_block_reports_minus_one():
    f0 = np.full((4, 4), 3, np.uint8)
    gif = ic.encode_gif_animation([f0], [0], loop=None)
    _, _, loop = ic.gif_animation(gif)
    assert loop == -1


def test_subrect_composites_over_previous():
    base = np.full((8, 8), 10, np.uint8)
    patch = np.full((2, 3), 250, np.uint8)
    gif = ic.encode_gif_animation([base, patch], [5, 5],
                                  disposals=[1, 1],
                                  rects=[(0, 0), (4, 2)])
    frames, _, _ = ic.gif_animation(gif)
    want = np.full((8, 8), 10, np.uint8)
    want[2:4, 4:7] = 250
    assert (frames[1][:, :, 0] == want).all()
    assert (frames[0][:, :, 0] == 10).all()


def test_disposal_2_restores_background():
    base = np.full((6, 6), 10, np.uint8)
    patch = np.full((2, 2), 200, np.uint8)
    tail = np.full((1, 1), 99, np.uint8)
    gif = ic.encode_gif_animation([base, patch, tail], [1, 1, 1],
                                  disposals=[1, 2, 1],
                                  rects=[(0, 0), (2, 2), (0, 0)],
                                  bg_idx=77)
    frames, _, _ = ic.gif_animation(gif)
    # frame 2: the patch rect was restored to background color 77
    want = np.full((6, 6), 10, np.uint8)
    want[2:4, 2:4] = 77
    want[0, 0] = 99
    assert (frames[2][:, :, 0] == want).all()


def test_disposal_3_restores_previous_canvas():
    base = np.full((6, 6), 10, np.uint8)
    patch = np.full((3, 3), 200, np.uint8)
    tail = np.full((1, 1), 99, np.uint8)
    gif = ic.encode_gif_animation([base, patch, tail], [1, 1, 1],
                                  disposals=[1, 3, 1],
                                  rects=[(0, 0), (1, 1), (5, 5)])
    frames, _, _ = ic.gif_animation(gif)
    want = np.full((6, 6), 10, np.uint8)  # patch fully undone
    want[5, 5] = 99
    assert (frames[2][:, :, 0] == want).all()
    # but frame 1 itself showed the patch
    assert frames[1][2, 2, 0] == 200


def test_transparent_index_leaves_canvas():
    base = np.full((4, 4), 10, np.uint8)
    over = np.full((4, 4), 5, np.uint8)   # 5 = transparent
    over[0, 0] = 77
    gif = ic.encode_gif_animation([base, over], [1, 1],
                                  transparent=5)
    frames, _, _ = ic.gif_animation(gif)
    want = np.full((4, 4), 10, np.uint8)
    want[0, 0] = 77
    assert (frames[1][:, :, 0] == want).all()
    # frame 0's transparent pixels show the background (index 0)
    assert frames[0][1, 1, 0] == 10


def test_frame_budget_rejected():
    f = np.zeros((2, 2), np.uint8)
    n = ic.MAX_GIF_FRAMES + 1
    gif = ic.encode_gif_animation([f] * n, [0] * n)
    with pytest.raises(ValueError):
        ic.gif_animation(gif)


def test_rect_outside_screen_rejected():
    f = np.zeros((4, 4), np.uint8)
    gif = ic.encode_gif_animation([f], [0], rects=[(3, 3)])
    with pytest.raises(ValueError):
        ic.gif_animation(gif)


def test_mutation_fuzz_value_error_only():
    f0 = np.full((6, 6), 30, np.uint8)
    f1 = np.full((3, 3), 90, np.uint8)
    base = ic.encode_gif_animation([f0, f1], [4, 4],
                                   disposals=[1, 2],
                                   rects=[(0, 0), (2, 2)],
                                   transparent=1)
    rng = random.Random(3)
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            frames, delays, loop = ic.gif_animation(bytes(b))
            assert frames and len(frames) == len(delays)
        except ValueError:
            pass
    for cut in range(0, len(base), 23):
        try:
            ic.gif_animation(base[:cut])
        except ValueError:
            pass
