"""LANTERN-TPU CLI — task dispatcher (reference: main.py).

Tasks:
  generate_images     text/class-conditional image generation with
                      speculative decoding (stats JSON compatible with the
                      reference's global_statistics_*.json schema)
  generate_codebook   VQ-codebook nearest-latent tables for LANTERN
  bench               one-line JSON throughput benchmark
  train_drafter       drafter self-distillation training (JAX/optax)
  generate_train_data drafter training data from base-model traces
  extract_code        images+captions -> VQ codes (+ caption embeddings)
  eval_fid_clip / eval_prec_recall / eval_hpsv2
                      offline quality metrics (torch-CPU; require the
                      corresponding eval dependencies)
"""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser(description="LANTERN-TPU")
    sub = parser.add_subparsers(dest="task", required=True)

    from entrypoints_tpu import generate_images
    generate_images.add_args(sub.add_parser("generate_images"))

    from entrypoints_tpu import generate_codebook
    generate_codebook.add_args(sub.add_parser("generate_codebook"))

    sub.add_parser("bench")

    from entrypoints_tpu import train_drafter
    train_drafter.add_args(sub.add_parser("train_drafter"))

    from entrypoints_tpu import generate_train_data
    generate_train_data.add_args(sub.add_parser("generate_train_data"))

    from entrypoints_tpu import extract_code
    extract_code.add_args(sub.add_parser("extract_code"))

    for name in ("eval_fid_clip", "eval_prec_recall", "eval_hpsv2"):
        sub.add_parser(name)

    args, extra = parser.parse_known_args()

    if args.task == "generate_images":
        return generate_images.run(args)
    if args.task == "generate_codebook":
        return generate_codebook.run(args)
    if args.task == "bench":
        import bench

        return bench.main()
    if args.task == "train_drafter":
        return train_drafter.run(args)
    if args.task == "generate_train_data":
        return generate_train_data.run(args)
    if args.task == "extract_code":
        return extract_code.run(args)
    if args.task in ("eval_fid_clip", "eval_prec_recall", "eval_hpsv2"):
        from entrypoints_tpu import evals

        return evals.run(args.task, extra)
    parser.error(f"unknown task {args.task}")


if __name__ == "__main__":
    sys.exit(main())
