"""Benchmark dataset classes + zero-shot classifier tests."""

import json
import os

import numpy as np
from PIL import Image

from clip_embeds_tpu.evals.benchmarks import (
    SugarCREPE,
    Winoground,
    get_benchmark,
    run_benchmark,
)
from clip_embeds_tpu.evals.zero_shot import (
    build_zero_shot_classifier,
    zero_shot_eval,
)
from clip_embeds_tpu.scores.score import Score


def _img(tmp_path, name, seed=0):
    rng = np.random.default_rng(seed)
    path = tmp_path / name
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)).save(path)
    return str(path)


def test_winoground_dataset(tmp_path):
    os.makedirs(tmp_path / "images")
    rows = []
    for i in range(4):
        _img(tmp_path, f"images/ex_{i}_img_0.png", i)
        _img(tmp_path, f"images/ex_{i}_img_1.png", i + 100)
        rows.append({
            "image_0": f"ex_{i}_img_0", "image_1": f"ex_{i}_img_1",
            "caption_0": f"caption zero {i}", "caption_1": f"caption one {i}",
        })
    with open(tmp_path / "examples.jsonl", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))

    ds = get_benchmark("winoground", str(tmp_path))
    assert len(ds) == 4
    assert len(ds[0]["images"]) == 2 and len(ds[0]["texts"]) == 2

    # perfect scorer: image i matches caption i
    def pair_forward(images, texts):
        out = []
        for img, txt in zip(images, texts):
            img_idx = 0 if "img_0" in img else 1
            txt_idx = 0 if "zero" in txt else 1
            out.append(1.0 if img_idx == txt_idx else 0.0)
        return np.asarray(out, np.float32)

    tensor, metrics = run_benchmark(Score(pair_forward), ds, batch_size=2)
    assert tensor.shape == (4, 2, 2)
    assert metrics == {"text": 1.0, "image": 1.0, "group": 1.0}


def test_sugarcrepe_dataset(tmp_path):
    os.makedirs(tmp_path / "images")
    data = {}
    for i in range(3):
        _img(tmp_path, f"images/{i}.jpg", i)
        data[str(i)] = {
            "filename": f"{i}.jpg",
            "caption": f"a real caption {i}",
            "negative_caption": f"a fake caption {i}",
        }
    with open(tmp_path / "swap_obj.json", "w") as f:
        json.dump(data, f)

    ds = SugarCREPE(str(tmp_path))
    assert len(ds) == 3

    def pair_forward(images, texts):
        return np.asarray(
            [1.0 if "real" in t else 0.0 for t in texts], np.float32
        )

    _, metrics = run_benchmark(Score(pair_forward), ds)
    assert metrics["text"] == 1.0
    assert metrics["text/swap_obj"] == 1.0


def test_missing_root_is_empty(tmp_path):
    ds = Winoground(str(tmp_path / "nope"))
    assert not ds.exists()
    assert len(ds) == 0


def test_zero_shot_classifier():
    rng = np.random.default_rng(0)
    # fake encoder: hash class word to a direction
    dim = 16

    def encode_texts(prompts):
        out = np.zeros((len(prompts), dim), np.float32)
        for i, p in enumerate(prompts):
            r = np.random.default_rng(abs(hash(p.split()[-1])) % 2**31)
            out[i] = r.standard_normal(dim)
        return out / np.linalg.norm(out, axis=-1, keepdims=True)

    classifier = build_zero_shot_classifier(
        encode_texts, ["cat", "dog", "car"], num_classes_per_batch=2
    )
    assert classifier.shape == (dim, 3)
    np.testing.assert_allclose(
        np.linalg.norm(classifier, axis=0), 1.0, rtol=1e-5
    )

    def encode_images(batch):
        # images ARE class indices here; return the class column + noise
        return np.stack([
            classifier[:, int(i)] + 0.01 * rng.standard_normal(dim)
            for i in batch
        ]).astype(np.float32)

    metrics = zero_shot_eval(
        encode_images, classifier, [0, 1, 2, 0, 1], [0, 1, 2, 0, 1],
        batch_size=2,
    )
    assert metrics["top1"] == 1.0


def test_naturalbench_and_seetrue(tmp_path):
    import json as _json

    from clip_embeds_tpu.evals.benchmarks import (
        NaturalBenchRetrieval,
        SeeTrue,
    )

    os.makedirs(tmp_path / "images")
    meta = []
    for i in range(3):
        _img(tmp_path, f"images/a{i}.jpg", i)
        _img(tmp_path, f"images/b{i}.jpg", i + 50)
        meta.append({
            "index": i, "image_0": f"a{i}.jpg", "image_1": f"b{i}.jpg",
            "caption_0": f"cap zero {i}", "caption_1": f"cap one {i}",
        })
    (tmp_path / "metadata.json").write_text(_json.dumps(meta))
    ds = NaturalBenchRetrieval(str(tmp_path))
    assert len(ds) == 3

    def pair_forward(images, texts):
        return np.asarray([
            1.0 if (("a" in os.path.basename(i)) == ("zero" in t)) else 0.0
            for i, t in zip(images, texts)
        ], np.float32)

    _, m = run_benchmark(Score(pair_forward), ds)
    assert m == {"text": 1.0, "image": 1.0, "group": 1.0}

    rows = [
        {"image": f"a{i}.jpg", "text": f"caption {i}", "label": i % 2,
         "source": "coco"}
        for i in range(4)
    ]
    (tmp_path / "seetrue.json").write_text(_json.dumps(rows))
    st = SeeTrue(str(tmp_path))

    def st_forward(images, texts):
        return np.asarray(
            [0.9 if int(t.split()[-1]) % 2 else 0.1 for t in texts], np.float32
        )

    _, m = run_benchmark(Score(st_forward), st)
    assert m["accuracy"] == 1.0
    assert m["accuracy/coco"] == 1.0


def test_genai_bench(tmp_path):
    import json as _json

    from clip_embeds_tpu.evals.benchmarks import GenAIBench

    os.makedirs(tmp_path / "images")
    meta = {}
    rng = np.random.default_rng(9)
    for i in range(8):
        _img(tmp_path, f"images/{i}.jpg", i)
        meta[f"{i:05d}"] = {
            "image": f"{i}.jpg", "prompt": f"prompt {i}",
            "human_alignment": [1 + i % 5, 1 + i % 5],
            "prompt_idx": i,
        }
    (tmp_path / "metadata.json").write_text(_json.dumps(meta))
    (tmp_path / "genai_skills.json").write_text(
        _json.dumps({"basic": [0, 1, 2, 3], "advanced": [4, 5, 6, 7]})
    )
    ds = GenAIBench(str(tmp_path))
    assert len(ds) == 8

    # perfect metric == human rating
    def pair_forward(images, texts):
        return np.asarray(
            [1 + int(t.split()[-1]) % 5 for t in texts], np.float32
        )

    tensor, m = run_benchmark(Score(pair_forward), ds)
    assert m["alignment"]["pairwise_acc"] == 1.0
    per_skill = ds.evaluate_scores_per_skill(tensor)
    assert set(per_skill) == {"basic", "advanced"}
