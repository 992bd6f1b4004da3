"""Build captions_val2017_longest.json: the longest caption per COCO image.

Reference: data/prompts/preprocess.py — keeps, for every image_id in the
MSCOCO-2017-val caption annotations, its longest caption (first-seen order).
"""

import argparse
import json


def longest_captions(annotations):
    by_image = {}
    for item in annotations:
        cap = item["caption"]
        image_id = item["image_id"]
        if image_id not in by_image or len(by_image[image_id]) < len(cap):
            by_image[image_id] = cap
    return list(by_image.values())


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", default="captions_val2017.json")
    p.add_argument("--output", default="captions_val2017_longest.json")
    args = p.parse_args(argv)
    with open(args.input) as f:
        captions = longest_captions(json.load(f)["annotations"])
    print(len(captions))
    with open(args.output, "w") as f:
        json.dump(captions, f, indent=4)


if __name__ == "__main__":
    main()
