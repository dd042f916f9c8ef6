"""Skeleton overlay rendering for qualitative inspection.

Reference parity: util/vis_tool.py — depth image mapped to gray via
``(img + 1) * 100`` (ref :20), prediction skeleton in reds and GT in
blues (BGR tuples, ref :11-14), with per-dataset joint-group and bone
tables (ref :43-78).
"""

from __future__ import annotations

import cv2
import numpy as np

# RED shades, BGR (reference vis_tool.py:11)
COLOR_PRED = [(0, 0, 102), (0, 0, 179), (0, 0, 255), (77, 77, 255),
              (153, 153, 255)]
# BLUE shades, BGR (reference vis_tool.py:14)
COLOR_GT = [(102, 0, 0), (179, 0, 0), (255, 0, 0), (255, 77, 77),
            (255, 153, 153)]

# per-dataset (joint groups, bones) (reference vis_tool.py:43-78)
SKELETONS = {
    "nyu": (
        [[0, 1], [2, 3], [4, 5], [6, 7], [8, 9, 10, 11, 12, 13]],
        [[(0, 1), (1, 13)],
         [(2, 3), (3, 13)],
         [(4, 5), (5, 13)],
         [(6, 7), (7, 13)],
         [(8, 9), (9, 10), (10, 13), (11, 13), (12, 13)]],
    ),
    "hands17": (
        [[1, 6, 7, 8], [2, 9, 10, 11], [3, 12, 13, 14], [4, 15, 16, 17],
         [5, 18, 19, 20, 0]],
        [[(0, 1), (1, 6), (6, 7), (7, 8)],
         [(0, 2), (2, 9), (9, 10), (10, 11)],
         [(0, 3), (3, 12), (12, 13), (13, 14)],
         [(0, 4), (4, 15), (15, 16), (16, 17)],
         [(0, 5), (5, 18), (18, 19), (19, 20)]],
    ),
    "icvl": (
        [[1, 2, 3], [4, 5, 6], [7, 8, 9], [10, 11, 12], [13, 14, 15, 0]],
        [[(0, 1), (1, 2), (2, 3)],
         [(0, 4), (4, 5), (5, 6)],
         [(0, 7), (7, 8), (8, 9)],
         [(0, 10), (10, 11), (11, 12)],
         [(0, 13), (13, 14), (14, 15)]],
    ),
    "msra": (
        [[1, 2, 3, 4], [5, 6, 7, 8], [9, 10, 11, 12], [13, 14, 15, 16],
         [17, 18, 19, 20, 0]],
        [[(0, 1), (1, 2), (2, 3), (3, 4)],
         [(0, 5), (5, 6), (6, 7), (7, 8)],
         [(0, 9), (9, 10), (10, 11), (11, 12)],
         [(0, 13), (13, 14), (14, 15), (15, 16)],
         [(0, 17), (17, 18), (18, 19), (19, 20)]],
    ),
}


def _draw_skeleton(image, jt_uvd, colors, dataset):
    jt_idx, sketch = SKELETONS[dataset]
    for i, color in enumerate(colors):
        for idx in jt_idx[i]:
            cv2.circle(image, (int(jt_uvd[idx][0]), int(jt_uvd[idx][1])),
                       2, color, -1)
        for s, e in sketch[i]:
            cv2.line(image, (int(jt_uvd[s][0]), int(jt_uvd[s][1])),
                     (int(jt_uvd[e][0]), int(jt_uvd[e][1])), color, 1)


def render_pose(img, jt_uvd_pred, jt_uvd_gt=None, dataset="nyu"):
    """Render overlay; returns HxWx3 uint8-range float image.

    Args:
      img: (H, W) or (1, H, W) normalized depth in [-1, 1].
      jt_uvd_pred / jt_uvd_gt: (J, 3) in crop *pixel* coordinates.
    """
    image = np.squeeze(np.asarray(img)).copy()
    image = (image + 1) * 100.0
    image = np.repeat(image[:, :, None], 3, axis=-1)
    _draw_skeleton(image, np.asarray(jt_uvd_pred).reshape(-1, 3),
                   COLOR_PRED, dataset)
    if jt_uvd_gt is not None:
        _draw_skeleton(image, np.asarray(jt_uvd_gt).reshape(-1, 3),
                       COLOR_GT, dataset)
    return image


def plot_pose(img, path, jt_uvd_pred, jt_uvd_gt=None, dataset="nyu"):
    """Render and write a PNG (reference vis_tool.py:17-28)."""
    cv2.imwrite(path, render_pose(img, jt_uvd_pred, jt_uvd_gt, dataset))
