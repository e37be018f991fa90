"""ONCE submission packager — counterpart of ``tools/once_submit_result.py``
(reference :1-56): filter result.pkl by score > 0.2 and test-set frame ids,
dump the submission pkl."""

import argparse
import pickle
from pathlib import Path

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--result_pkl", type=str, required=True)
    parser.add_argument("--testset_list", type=str, required=True,
                        help="ImageSets/test.txt style frame-id list")
    parser.add_argument("--output", type=str, default="submission.pkl")
    parser.add_argument("--score_thresh", type=float, default=0.2)
    args = parser.parse_args()

    with open(args.result_pkl, "rb") as f:
        results = pickle.load(f)
    test_ids = set(x.strip() for x in open(args.testset_list).readlines())

    submission = []
    for anno in results:
        if str(anno["frame_id"]) not in test_ids:
            continue
        keep = np.asarray(anno["score"]) > args.score_thresh
        submission.append(
            {
                "frame_id": anno["frame_id"],
                "name": np.asarray(anno["name"])[keep],
                "score": np.asarray(anno["score"])[keep],
                "boxes_3d": np.asarray(anno["boxes_3d"])[keep],
            }
        )
    with open(args.output, "wb") as f:
        pickle.dump(submission, f)
    print(f"wrote {len(submission)} frames to {args.output}")


if __name__ == "__main__":
    main()
