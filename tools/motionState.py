"""Motion-state classification CLI (pipeline stage 4b).

Capability parity with reference ``tools/motionState.py``: per-track features
[displacement, center variance], train a linear SVM on the train split's GT static
bit, split tracks into trackStatic / trackDynamic pickles (GT split for train,
predicted split for val).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import argparse
import os
import pickle

from tdal.pipeline.motion_state import (
    fit_motion_classifier,
    split_by_prediction,
    track_features,
)
from tdal.runtime.logging_utils import DEFAULT_SEED, fix_seed


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--track_train", required=True, help="Path to train track data dir.")
    parser.add_argument("--track_val", required=True, help="Path to val track data dir.")
    parser.add_argument("--split", type=int, default=16)
    args = parser.parse_args()

    fix_seed(DEFAULT_SEED)

    print("> Reading train data")
    track_train = {}
    for i in range(args.split):
        with open(os.path.join(args.track_train, f"track_{i}.pkl"), "rb") as f:
            track_train.update(pickle.load(f))
    with open(os.path.join(args.track_train, "trackGT.pkl"), "rb") as f:
        trackGT_train = pickle.load(f)

    print("> Processing train data")
    trainX, trainY, static, dynamic = track_features(
        track_train, trackGT_train, training=True
    )

    print("> Saving train trackStatic/trackDynamic shards")
    for name, data in (("trackStatic", static), ("trackDynamic", dynamic)):
        items = list(data.items())
        for i in range(args.split):
            shard = dict(items[len(items) * i // args.split : len(items) * (i + 1) // args.split])
            with open(os.path.join(args.track_train, f"{name}_{i}.pkl"), "wb") as f:
                pickle.dump(shard, f)

    print("> Reading val data")
    with open(os.path.join(args.track_val, "track.pkl"), "rb") as f:
        track_val = pickle.load(f)
    with open(os.path.join(args.track_val, "trackGT.pkl"), "rb") as f:
        trackGT_val = pickle.load(f)
    valX, valY, new_track_val = track_features(track_val, trackGT_val)

    print(f"[Info] Number of train: {trainX.shape[0]}")
    print(f"[Info] Number of val: {valX.shape[0]}")

    clf = fit_motion_classifier(trainX, trainY)
    if len(valX):
        print(f"> Score on test set: {clf.score(valX, valY)}")
        y_pred = clf.predict(valX)
    else:
        y_pred = []
    trackStatic, trackDynamic = split_by_prediction(new_track_val, y_pred)

    with open(os.path.join(args.track_val, "trackStatic.pkl"), "wb") as f:
        pickle.dump(trackStatic, f)
    with open(os.path.join(args.track_val, "trackDynamic.pkl"), "wb") as f:
        pickle.dump(trackDynamic, f)
    print(f"> val: {len(trackStatic)} static, {len(trackDynamic)} dynamic tracks")


if __name__ == "__main__":
    main()
