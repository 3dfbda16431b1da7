#!/usr/bin/env python3
"""Generates screen-content raw YUV420 frames (text-like glyph grids, flat
panels, sharp window edges, a scrolling region and a moving cursor) — the
high-redundancy content class where recompression margins are largest.
Writes planar I420 for tools/make_corpus raw= input.

Usage: make_screen.py out.yuv [w] [h] [frames] [seed]
"""
import sys

import numpy as np


def main():
    out = sys.argv[1]
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 480
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 50
    seed = int(sys.argv[5]) if len(sys.argv) > 5 else 5
    rng = np.random.default_rng(seed)

    # Background: flat desktop with a few rectangular "windows".
    bg = np.full((h, w), 210, np.uint8)
    for _ in range(4):
        x0, y0 = rng.integers(0, w // 2), rng.integers(0, h // 2)
        ww, wh = rng.integers(w // 4, w // 2), rng.integers(h // 4, h // 2)
        lum = rng.integers(60, 245)
        bg[y0:y0 + wh, x0:x0 + ww] = lum
        bg[y0:y0 + 2, x0:x0 + ww] = 30  # title bar edge

    # Text-like texture: random glyph bitmaps stamped on a grid.
    glyphs = (rng.random((64, 8, 6)) < 0.45).astype(np.uint8)
    text = bg.copy()
    for gy in range(8, h - 16, 12):
        for gx in range(8, w - 8, 8):
            if rng.random() < 0.7:
                g = glyphs[rng.integers(0, 64)]
                blk = text[gy:gy + 8, gx:gx + 6]
                blk[g == 1] = 20

    uplane = np.full((h // 2, w // 2), 128, np.uint8)
    vplane = np.full((h // 2, w // 2), 128, np.uint8)

    scroll_y0, scroll_h = h // 3, h // 3
    with open(out, "wb") as f:
        for i in range(n):
            fr = text.copy()
            # Scrolling region: shift by 4 px/frame (clean motion vectors).
            sh = (i * 4) % scroll_h
            region = text[scroll_y0:scroll_y0 + scroll_h]
            fr[scroll_y0:scroll_y0 + scroll_h] = np.roll(region, -sh, axis=0)
            # Moving cursor block.
            cx = (40 + i * 9) % (w - 12)
            cy = (60 + i * 5) % (h - 18)
            fr[cy:cy + 16, cx:cx + 9] = 255 - fr[cy:cy + 16, cx:cx + 9]
            f.write(fr.tobytes())
            f.write(uplane.tobytes())
            f.write(vplane.tobytes())
    print(f"wrote {n} frames {w}x{h} to {out}")


if __name__ == "__main__":
    main()
