"""Benchmark dataset classes with ``evaluate_scores`` (t2v_metrics pattern).

Reference: t2v_metrics/dataset.py — each dataset yields
{'images': [...], 'texts': [...]} samples for Score.batch_forward and owns an
``evaluate_scores(scores)`` that turns the [N, n_img, n_txt] tensor into its
published metric (Winoground text/image/group :205-230; SugarCREPE text acc
:231-253; EqBen/Flickr variants :255-277). Data lives under a local root dir
(the reference auto-downloads via gdown/HF — zero-egress here, so the root
must be pre-populated; ``exists()`` reports availability).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from .metrics import winoground_accuracy, winoground_scores


class BenchmarkDataset:
    """List of {'images': [...], 'texts': [...]} samples."""

    def __init__(self, root_dir: str):
        self.root_dir = root_dir
        self.samples: List[Dict] = []
        if self.exists():
            self.samples = self._load()

    def exists(self) -> bool:
        return os.path.isdir(self.root_dir)

    def _load(self) -> List[Dict]:
        raise NotImplementedError

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        return self.samples[idx]

    def evaluate_scores(self, scores: np.ndarray) -> Dict[str, float]:
        raise NotImplementedError


class Winoground(BenchmarkDataset):
    """2 images x 2 captions; text/image/group accuracy
    (t2v dataset.py:277-378). Expects root with examples.jsonl + images/."""

    def _load(self):
        path = os.path.join(self.root_dir, "examples.jsonl")
        samples = []
        with open(path) as fh:
            for line in fh:
                ex = json.loads(line)
                samples.append({
                    "images": [
                        os.path.join(self.root_dir, "images",
                                     ex["image_0"] + ".png"),
                        os.path.join(self.root_dir, "images",
                                     ex["image_1"] + ".png"),
                    ],
                    "texts": [ex["caption_0"], ex["caption_1"]],
                })
        return samples

    def evaluate_scores(self, scores: np.ndarray) -> Dict[str, float]:
        return winoground_accuracy(winoground_scores(np.asarray(scores)))


class SugarCREPE(BenchmarkDataset):
    """1 image x (positive, hard-negative) captions; text accuracy
    (dataset.py:1916-1980, get_sugarcrepe_acc :242-253). Root holds
    <split>.json files keyed by id with tested_labels [pos, neg]."""

    SPLITS = (
        "add_att", "add_obj", "replace_att", "replace_obj",
        "replace_rel", "swap_att", "swap_obj",
    )

    def __init__(self, root_dir: str, image_root: Optional[str] = None):
        self.image_root = image_root or os.path.join(root_dir, "images")
        super().__init__(root_dir)

    def _load(self):
        samples = []
        self.split_slices = {}
        start = 0
        for split in self.SPLITS:
            path = os.path.join(self.root_dir, f"{split}.json")
            if not os.path.exists(path):
                continue
            with open(path) as fh:
                data = json.load(fh)
            for ex in data.values():
                samples.append({
                    "images": [os.path.join(self.image_root, ex["filename"])],
                    "texts": [ex["caption"], ex["negative_caption"]],
                })
            self.split_slices[split] = (start, len(samples))
            start = len(samples)
        return samples

    def evaluate_scores(self, scores: np.ndarray) -> Dict[str, float]:
        scores = np.asarray(scores)  # [N, 1, 2]
        correct = scores[:, 0, 0] > scores[:, 0, 1]
        out = {"text": float(correct.mean())}
        for split, (lo, hi) in getattr(self, "split_slices", {}).items():
            if hi > lo:
                out[f"text/{split}"] = float(correct[lo:hi].mean())
        return out


class EqBenMini(BenchmarkDataset):
    """Winoground-format subset (dataset.py:699-757): ann.json rows with
    image0/image1/caption0/caption1."""

    def _load(self):
        path = os.path.join(self.root_dir, "ann.json")
        with open(path) as fh:
            data = json.load(fh)
        return [{
            "images": [
                os.path.join(self.root_dir, "images", ex["image0"]),
                os.path.join(self.root_dir, "images", ex["image1"]),
            ],
            "texts": [ex["caption0"], ex["caption1"]],
        } for ex in data]

    evaluate_scores = Winoground.evaluate_scores


BENCHMARKS = {
    "winoground": Winoground,
    "sugarcrepe": SugarCREPE,
    "eqben_mini": EqBenMini,
}


def get_benchmark(name: str, root_dir: str, **kw) -> BenchmarkDataset:
    return BENCHMARKS[name.lower()](root_dir, **kw)


def run_benchmark(score, dataset: BenchmarkDataset, batch_size: int = 16):
    """score: scores.score.Score; returns (scores_tensor, metrics)."""
    tensor = score.batch_forward(dataset.samples, batch_size=batch_size)
    return tensor, dataset.evaluate_scores(tensor)


class NaturalBenchRetrieval(BenchmarkDataset):
    """2x2 winoground-format retrieval pairs (t2v dataset.py:1784-1843):
    metadata.json rows with image_0/image_1/caption_0/caption_1."""

    def _load(self):
        path = os.path.join(self.root_dir, "metadata.json")
        with open(path) as fh:
            metadata = json.load(fh)
        image_dir = os.path.join(self.root_dir, "images")
        return [{
            "images": [
                os.path.join(image_dir, ex["image_0"]),
                os.path.join(image_dir, ex["image_1"]),
            ],
            "texts": [ex["caption_0"], ex["caption_1"]],
        } for ex in metadata]

    evaluate_scores = Winoground.evaluate_scores


class COCOCounterfactuals(BenchmarkDataset):
    """COCO-Counterfactuals winoground-format pairs (dataset.py:1850-1914)."""

    _load = NaturalBenchRetrieval._load
    evaluate_scores = Winoground.evaluate_scores


class SeeTrue(BenchmarkDataset):
    """Binary alignment pairs: each sample one image x one text with a 0/1
    label (t2v dataset.py SeeTrue); metric = per-source accuracy with a 0.5
    threshold on the (normalized) score."""

    def _load(self):
        path = os.path.join(self.root_dir, "seetrue.json")
        with open(path) as fh:
            rows = json.load(fh)
        self.labels = [int(r["label"]) for r in rows]
        self.sources = [r.get("source", "all") for r in rows]
        return [{
            "images": [os.path.join(self.root_dir, "images", r["image"])],
            "texts": [r["text"]],
        } for r in rows]

    def evaluate_scores(self, scores: np.ndarray) -> Dict[str, float]:
        scores = np.asarray(scores).reshape(len(self.samples))
        preds = (scores > 0.5).astype(int)
        labels = np.asarray(self.labels)
        out = {"accuracy": float((preds == labels).mean())}
        for source in sorted(set(self.sources)):
            idx = [i for i, s in enumerate(self.sources) if s == source]
            out[f"accuracy/{source}"] = float(
                (preds[idx] == labels[idx]).mean()
            )
        return out


BENCHMARKS.update({
    "naturalbench_retrieval": NaturalBenchRetrieval,
    "coco_counterfactuals": COCOCounterfactuals,
    "seetrue": SeeTrue,
})


class GenAIBench(BenchmarkDataset):
    """GenAI-Bench image alignment (t2v dataset.py:1263-1430): generated
    images with per-prompt human 1-5 alignment ratings; metric = human
    correlation bundle, optionally per skill tag.

    Root layout: metadata.json {image_idx: {image, prompt, human_alignment:
    [ratings]}}, optional genai_skills.json {tag: [prompt_idx,...]}."""

    def _load(self):
        with open(os.path.join(self.root_dir, "metadata.json")) as fh:
            self.metadata = json.load(fh)
        self.keys = sorted(self.metadata)
        return [{
            "images": [os.path.join(self.root_dir, "images",
                                    self.metadata[k]["image"])],
            "texts": [self.metadata[k]["prompt"]],
        } for k in self.keys]

    def evaluate_scores(self, scores: np.ndarray) -> Dict[str, float]:
        from .tau import correlation_metrics

        ours = np.asarray(scores).reshape(len(self.samples))
        human = [
            float(np.mean(self.metadata[k]["human_alignment"]))
            for k in self.keys
        ]
        return {"alignment": correlation_metrics(human, ours)}

    def evaluate_scores_per_skill(self, scores: np.ndarray) -> Dict[str, Dict]:
        from .tau import correlation_metrics

        ours = np.asarray(scores).reshape(len(self.samples))
        human = np.asarray([
            float(np.mean(self.metadata[k]["human_alignment"]))
            for k in self.keys
        ])
        with open(os.path.join(self.root_dir, "genai_skills.json")) as fh:
            tags = json.load(fh)
        prompt_of = {
            k: self.metadata[k].get("prompt_idx", i)
            for i, k in enumerate(self.keys)
        }
        out = {}
        for tag, prompt_idxs in tags.items():
            idx = [i for i, k in enumerate(self.keys)
                   if prompt_of[k] in prompt_idxs]
            if idx:
                out[tag] = {"alignment": correlation_metrics(
                    human[idx], ours[idx]
                )}
        return out


BENCHMARKS["genai_bench"] = GenAIBench
