"""BEV scene visualization (reference `tools/visual.py` used open3d; this
environment has no display/open3d, so scenes render to PNG via matplotlib)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def draw_scenes(points, gt_boxes=None, pred_boxes=None, out_path="scene.png",
                pc_range=None):
    """points (N, 3+); boxes (M, 7+) det3d convention -> BEV PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pillarnet_lts_tpu.core.bbox import box_np_ops

    fig, ax = plt.subplots(figsize=(12, 12))
    ax.scatter(points[:, 0], points[:, 1], s=0.05, c=points[:, 2],
               cmap="viridis", alpha=0.5)

    def _draw(boxes, color):
        if boxes is None or len(boxes) == 0:
            return
        corners = box_np_ops.center_to_corner_box2d(
            boxes[:, :2], boxes[:, 3:5], boxes[:, -1]
        )
        for c in corners:
            poly = np.vstack([c, c[:1]])
            ax.plot(poly[:, 0], poly[:, 1], color=color, linewidth=1.0)

    _draw(gt_boxes, "lime")
    _draw(pred_boxes, "red")

    if pc_range is not None:
        ax.set_xlim(pc_range[0], pc_range[3])
        ax.set_ylim(pc_range[1], pc_range[4])
    ax.set_aspect("equal")
    ax.set_facecolor("black")
    fig.savefig(out_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--demo", action="store_true",
                        help="render a synthetic DemoDataset frame")
    parser.add_argument("--out", default="scene.png")
    args = parser.parse_args()

    if args.demo:
        from pillarnet_lts_tpu.datasets.demo import DemoDataset

        ds = DemoDataset(num_frames=1, num_points=20000)
        points, boxes, _ = ds._synth_frame(0)
        path = draw_scenes(points, gt_boxes=boxes, out_path=args.out)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
