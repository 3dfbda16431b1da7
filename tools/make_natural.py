#!/usr/bin/env python3
"""Generates camera-like raw YUV420 test frames (smooth textures, panning,
moving objects, film grain) so the corpus includes content with the structured
redundancy real footage has — synthetic noise clips understate achievable
compression. Writes planar I420 to stdout or a file for make_corpus raw= input.

Usage: make_natural.py out.yuv [w] [h] [frames] [seed]
"""
import sys

import numpy as np
import cv2


def main():
    out = sys.argv[1]
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 480
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 50
    seed = int(sys.argv[5]) if len(sys.argv) > 5 else 7
    rng = np.random.default_rng(seed)

    # Static "scene": multi-octave smoothed noise = natural-ish texture.
    big_w, big_h = w * 2, h * 2
    scene = np.zeros((big_h, big_w), np.float32)
    for octave, amp in [(8, 20), (32, 40), (128, 60)]:
        layer = rng.normal(0, 1, (big_h // octave + 2, big_w // octave + 2)).astype(np.float32)
        layer = cv2.resize(layer, (big_w, big_h), interpolation=cv2.INTER_CUBIC)
        scene += amp * layer
    scene = np.clip(scene + 128, 16, 235)
    scene_u = cv2.GaussianBlur(
        np.clip(rng.normal(128, 18, (big_h, big_w)).astype(np.float32), 16, 240), (0, 0), 24)
    scene_v = cv2.GaussianBlur(
        np.clip(rng.normal(128, 18, (big_h, big_w)).astype(np.float32), 16, 240), (0, 0), 24)

    # Moving objects: soft-edged ellipses with their own velocities.
    objs = [
        dict(x=rng.uniform(0, w), y=rng.uniform(0, h), vx=rng.uniform(-3, 3),
             vy=rng.uniform(-2, 2), rx=rng.uniform(20, 60), ry=rng.uniform(15, 45),
             lum=rng.uniform(60, 200))
        for _ in range(6)
    ]

    with open(out, "wb") as f:
        for i in range(n):
            # Slow pan + slight zoom of the big scene.
            px = int(40 + 2.2 * i)
            py = int(30 + 1.1 * i)
            y_pl = scene[py:py + h, px:px + w].copy()
            u_pl = scene_u[py:py + h, px:px + w]
            v_pl = scene_v[py:py + h, px:px + w]
            for o in objs:
                o["x"] = (o["x"] + o["vx"]) % w
                o["y"] = (o["y"] + o["vy"]) % h
                yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
                d = ((xx - o["x"]) / o["rx"]) ** 2 + ((yy - o["y"]) / o["ry"]) ** 2
                mask = np.clip(1.5 - d, 0, 1)
                y_pl = y_pl * (1 - 0.8 * mask) + o["lum"] * 0.8 * mask
            # Film grain.
            y_pl = y_pl + rng.normal(0, 1.2, y_pl.shape)
            y8 = np.clip(y_pl, 16, 235).astype(np.uint8)
            u8 = np.clip(cv2.resize(u_pl, (w // 2, h // 2)), 16, 240).astype(np.uint8)
            v8 = np.clip(cv2.resize(v_pl, (w // 2, h // 2)), 16, 240).astype(np.uint8)
            f.write(y8.tobytes())
            f.write(u8.tobytes())
            f.write(v8.tobytes())
    print(f"wrote {n} frames {w}x{h} to {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
