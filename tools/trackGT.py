"""GT track builder CLI (pipeline stage 4a).

Capability parity with reference ``tools/trackGT.py``: groups GT boxes by object name
across frames in the global frame and labels each track static iff displacement < 1m
and max speed < 1 m/s.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import argparse
import pickle

from tdal.pipeline.motion_state import build_track_gt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--infos", required=True, help="Path to infos file.")
    parser.add_argument("--result", required=True, help="Path to result file.")
    args = parser.parse_args()

    with open(args.infos, "rb") as f:
        infos = pickle.load(f)
    trackGT = build_track_gt(infos)
    with open(args.result, "wb") as f:
        pickle.dump(trackGT, f)
    n_static = sum(v["static"] for v in trackGT.values())
    print(f"{len(trackGT)} GT tracks ({n_static} static)")


if __name__ == "__main__":
    main()
