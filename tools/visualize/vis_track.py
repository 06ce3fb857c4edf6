"""Visualize tracks: per-track merged points + box sequence. Parity:
tools/visualize/vis_track.py (headless BEV PNGs)."""

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from tdal.utils.visualize import plot_track


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--track", required=True, help="track.pkl / trackStatic.pkl")
    parser.add_argument("--out_dir", default="vis_out")
    parser.add_argument("--n_tracks", type=int, default=5)
    parser.add_argument("--open3d", action="store_true",
                        help="interactive 3D viewer (needs open3d)")
    args = parser.parse_args()

    with open(args.track, "rb") as f:
        track = pickle.load(f)
    for tid, tr in list(track.items())[: args.n_tracks]:
        if args.open3d:
            from tdal.utils.visualize import show_track_open3d

            show_track_open3d(tr)
            continue
        out = Path(args.out_dir) / f"track_{tid}.png"
        plot_track(tr, None, out_path=out, title=str(tid))
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
