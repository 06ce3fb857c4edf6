"""Track data reorganization CLI (pipeline stage 3).

Capability parity with reference ``tools/trackData.py:25-57``: frame-keyed trackData
pickles -> trackID-keyed {type, bbox, score, point, match, token} dicts; 16-way shard
for the train split, single track.pkl for val.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import argparse
import os
import pickle


def reorganize(track: dict) -> dict:
    """frame-keyed -> trackID-keyed. Parity: trackData.py:26-45."""
    tracking = {}
    for token, frame in track.items():
        ids = frame["id"]
        for idx in range(len(ids)):
            entry = tracking.setdefault(
                ids[idx],
                {"type": [], "bbox": [], "score": [], "point": [], "match": [], "token": []},
            )
            entry["type"].append(frame["type"][idx])
            entry["bbox"].append(frame["bbox"][idx])
            entry["score"].append(frame["score"][idx])
            entry["point"].append(frame["point"][idx])
            entry["match"].append(frame["match"][idx])
            entry["token"].append(token)
    return tracking


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--work_dir", required=True, help="Path to working dir (train or val).")
    parser.add_argument("--split", type=int, default=16, help="Number of train shards.")
    args = parser.parse_args()

    split_name = args.work_dir.rstrip("/").split("/")[-1]
    if split_name == "train":
        track = {}
        for i in range(args.split):
            with open(os.path.join(args.work_dir, f"trackData_{i}.pkl"), "rb") as f:
                track.update(pickle.load(f))
    elif split_name == "val":
        with open(os.path.join(args.work_dir, "trackData.pkl"), "rb") as f:
            track = pickle.load(f)
    else:
        raise NotImplementedError(f"split {split_name!r} not supported (train/val).")

    tracking = reorganize(track)

    if split_name == "train":
        items = list(tracking.items())
        for i in range(args.split):
            shard = dict(items[len(items) * i // args.split : len(items) * (i + 1) // args.split])
            with open(os.path.join(args.work_dir, f"track_{i}.pkl"), "wb") as f:
                pickle.dump(shard, f)
    else:
        with open(os.path.join(args.work_dir, "track.pkl"), "wb") as f:
            pickle.dump(tracking, f)
    print(f"Reorganized {len(tracking)} tracks")


if __name__ == "__main__":
    main()
