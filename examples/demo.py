"""Walkthrough: the full video -> grouped-faces pipeline on a sample clip.

Equivalent of the reference's demo.ipynb as a runnable script. Point it at
any video file:

    python examples/demo.py path/to/video.mp4 --style live

Stage 1 (detection) writes cropped faces to <out>/faces with debug frames and
reject logs under <out>/intermediate; stage 2 (grouping) clusters them with
automatic K selection. Run stages separately via --mode.
"""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from videotofaces_tpu import video_to_faces
from videotofaces_tpu.utils.profiling import StageTimer, trace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("video")
    ap.add_argument("--style", default="live", choices=["live", "anime"])
    ap.add_argument("--mode", default="full", choices=["full", "detection", "grouping"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--step", type=float, default=1.0)
    ap.add_argument("--profile-dir", default=None,
                    help="write a jax.profiler device trace here")
    args = ap.parse_args()

    out = args.out or osp.join(osp.dirname(osp.abspath(args.video)), "demo_out")
    os.makedirs(out, exist_ok=True)

    timer = StageTimer()
    with trace(args.profile_dir):
        with timer.stage("pipeline"):
            video_to_faces(
                input_path=args.video,
                out_dir=out,
                style=args.style,
                mode=args.mode,
                video_step=args.step,
                save_frames=True,
                save_rejects=True,
                group_log=True,
            )
    timer.report()
    print(f"\nResults under: {out}")
    print("  faces/           grouped face crops")
    print("  intermediate/    debug frames, reject crops, CSV audit logs")


if __name__ == "__main__":
    main()
