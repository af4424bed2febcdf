"""t2v_metrics-style benchmark loop: one score model x many datasets.

Reference: t2v_metrics/eval.py:22-52 — builds a score model by name and
loops `dataset -> batch_forward -> evaluate_scores` over the VQAScore-paper
datasets. Here the score model resolves through the native stack:

  * any registry CLIP arch (e.g. ViT-L-14-336, convnext_base_w) -> CLIPScore
  * 'siglip:<arch>' -> SigLIP sigmoid pairing (needs an HF tokenizer)
  * VQAScore/ITM models need converted checkpoints (pass --checkpoint)

Usage:
  python -m clip_embeds_tpu.cli.t2v_eval --model ViT-L-14-336 \
      --pretrained /ckpt.pt --root_dir /data/t2v \
      --datasets winoground sugarcrepe eqben_mini
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import List, Optional

DEFAULT_DATASETS = [
    # the reference eval.py main loop (eval.py:38-49)
    "winoground", "naturalbench_retrieval", "eqben_mini", "seetrue",
    "sugarcrepe", "cococounterfactuals",
]


def build_score(args):
    import jax.numpy as jnp

    from ..core.factory import create_model
    from ..scores.score import CLIPScore

    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    if args.model.startswith("siglip:"):
        raise SystemExit(
            "siglip scoring needs the sentencepiece tokenizer; use "
            "cli.eval --scorer siglip with an injected tokenizer instead"
        )
    model, params = create_model(args.model, args.pretrained, dtype=dtype)
    return CLIPScore(model, params, batch_size=args.batch_size)


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--root_dir", default="./datasets")
    p.add_argument("--model", default="ViT-L-14-336")
    p.add_argument("--pretrained", default=None)
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--datasets", nargs="+", default=DEFAULT_DATASETS)
    p.add_argument("--output", default=None,
                   help="optional results .json path")
    args = p.parse_args(argv)

    from ..evals.benchmarks import get_benchmark, run_benchmark

    score = build_score(args)
    results = {}
    for name in args.datasets:
        try:
            dataset = get_benchmark(name, args.root_dir)
        except FileNotFoundError as e:
            print(f"{name}: data missing ({e}); skipping", file=sys.stderr)
            continue
        _, metrics = run_benchmark(score, dataset,
                                   batch_size=args.batch_size)
        results[name] = metrics
        print(name, json.dumps(metrics))
    if args.output:
        with open(args.output, "w") as fh:
            json.dump(results, fh, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
