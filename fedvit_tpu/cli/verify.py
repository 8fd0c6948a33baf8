"""Verification harness — parity of /root/reference/verify_mps.py.

    python -m fedvit_tpu.cli.verify [--device cpu|tpu]

12+ synthetic-data smoke tests covering the same surface as the reference's
MPS harness (model fwd with/without metadata, loss, EMA, MixUp/CutMix,
scheduler shape, transforms, metadata encoding, datasets, TTA, a full train
step with LLRD+EMA+clip, bf16 compute, checkpoint round-trip) — decorator
PASS/FAIL collection, exit 1 on any failure (verify_mps.py:29-41,352-363).
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import traceback
from typing import Callable, Dict

RESULTS: Dict[str, str] = {}


def test(name: str):
    def deco(fn: Callable):
        def run():
            try:
                fn()
                RESULTS[name] = "PASS"
                print(f"  [PASS] {name}")
            except Exception as e:
                RESULTS[name] = f"FAIL: {e}"
                print(f"  [FAIL] {name}: {e}")
                traceback.print_exc()
        return run
    return deco


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Synthetic smoke-test suite")
    parser.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    args = parser.parse_args(argv)

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fedvit_tpu.core.config import from_dict
    from fedvit_tpu.data.constants import encode_metadata_vector
    from fedvit_tpu.data.pipeline import ArrayDataSource, make_device_augment
    from fedvit_tpu.data.synthetic import make_synthetic_dataset
    from fedvit_tpu.models import build_model
    from fedvit_tpu.ops import image as I
    from fedvit_tpu.train import checkpoint as ckpt
    from fedvit_tpu.train.ema import ema_init, ema_update
    from fedvit_tpu.train.losses import build_loss
    from fedvit_tpu.train.mixup import cutmix, mixup, mixup_cutmix
    from fedvit_tpu.train.optim import build_optimizer
    from fedvit_tpu.train.schedule import lr_curve
    from fedvit_tpu.train.state import TrainState
    from fedvit_tpu.train.step import make_train_step

    print(f"Device: {jax.devices()[0]}")
    cfg = from_dict({
        "model": {"backbone": "vit_tiny_patch16_224", "image_size": 32,
                  "compute_dtype": "float32", "drop_path_rate": 0.0},
        "data": {"use_segmentation_mask": False},
        "training": {"batch_size": 8, "gradient_accumulation_steps": 2,
                     "ema": {"enabled": True, "decay": 0.99}},
        "loss": {"type": "asymmetric"},
    })
    model = build_model(cfg)
    rng = jax.random.key(0)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        size=(4, 32, 32, 3)).astype(np.float32))
    meta = jnp.zeros((4, 13))
    variables = model.init({"params": rng, "dropout": rng}, x, meta)
    loss_fn = build_loss(cfg)

    @test("model forward with metadata")
    def t1():
        out = model.apply(variables, x, meta)
        assert out["logits"].shape == (4, 8)

    @test("model forward without metadata (zero-filled embedding)")
    def t2():
        out = model.apply(variables, x, None)
        assert out["logits"].shape == (4, 8)

    @test("loss positive scalar")
    def t3():
        v = loss_fn(jnp.zeros((4, 8)), jnp.zeros((4,), jnp.int32))
        assert v.shape == () and float(v) > 0

    @test("EMA update/swap semantics")
    def t4():
        p = {"w": jnp.ones(3)}
        s = ema_update(ema_init(p), {"w": jnp.ones(3) * 3}, 0.9)
        assert np.allclose(s["w"], 1.2)

    @test("MixUp / CutMix / combinator")
    def t5():
        labels = jnp.zeros((4,), jnp.int32)
        for fn in (mixup, cutmix):
            mixed, la, lb, lam = fn(jax.random.key(0), x, labels)
            assert mixed.shape == x.shape and 0 <= float(lam) <= 1
        mixed, *_ = mixup_cutmix(jax.random.key(1), x, labels)
        assert mixed.shape == x.shape

    @test("scheduler warmup then cosine decay")
    def t6():
        c = lr_curve(1e-4, 5, 20, 1e-6)
        assert c[0] == 0.0 and c[1] < c[5] and c[-1] < c[6]

    @test("train/eval transforms (paired mask shapes)")
    def t7():
        m = jnp.ones(x.shape[:3] + (1,))
        img, mk = I.train_transform(jax.random.key(0), x, m, out_size=24,
                                    randaugment_n=1, randaugment_m=5)
        assert img.shape == (4, 24, 24, 3) and mk.shape == (4, 24, 24, 1)
        img, mk = I.eval_transform(x, m, out_size=24)
        assert img.shape == (4, 24, 24, 3)

    @test("metadata one-hot positions")
    def t8():
        v = encode_metadata_vector(0.5, 1, 3)
        assert v[0] == 0.5 and v[2] == 1.0 and v[1 + 3 + 3] == 1.0
        assert v.sum() == 2.5

    @test("synthetic dataset + source")
    def t9():
        data = make_synthetic_dataset(n=16, image_size=32)
        src = ArrayDataSource(data)
        b = src.gather(np.arange(4))
        assert b["image"].shape == (4, 32, 32, 3)
        assert b["metadata"].shape == (4, 13)

    @test("TTA views (8, deterministic)")
    def t10():
        views, _ = I.tta_views(x, out_size=24)
        assert views.shape == (4, 8, 24, 24, 3)
        v2, _ = I.tta_views(x, out_size=24)
        assert np.allclose(views, v2)

    @test("full train step: accum+LLRD+clip+EMA")
    def t11():
        tx, _ = build_optimizer(cfg, variables["params"], 4)
        state = TrainState.create(model.apply, variables["params"],
                                  variables.get("batch_stats", {}), tx,
                                  jax.random.key(1))
        step = make_train_step(cfg, loss_fn, donate=False)
        batch = {"image": jnp.concatenate([x, x]),
                 "label": jnp.zeros((8,), jnp.int32),
                 "metadata": jnp.zeros((8, 13))}
        state, m = step(state, batch)
        assert np.isfinite(float(m["loss"])) and int(state.step) == 1

    @test("bfloat16 compute path")
    def t12():
        cfg_bf = from_dict({"model": {"backbone": "vit_tiny_patch16_224",
                                      "image_size": 32,
                                      "compute_dtype": "bfloat16"},
                            "data": {"use_segmentation_mask": False}})
        m_bf = build_model(cfg_bf)
        v = m_bf.init({"params": rng, "dropout": rng}, x, meta)
        out = m_bf.apply(v, x, meta)
        assert out["logits"].dtype == jnp.float32
        assert np.isfinite(np.asarray(out["logits"])).all()

    @test("checkpoint save/load round-trip")
    def t13():
        tx, _ = build_optimizer(cfg, variables["params"], 4)
        state = TrainState.create(model.apply, variables["params"],
                                  variables.get("batch_stats", {}), tx,
                                  jax.random.key(1))
        with tempfile.TemporaryDirectory() as d:
            ckpt.save_checkpoint(f"{d}/c", state, 3, 0.5, 1, cfg)
            meta_d = ckpt.load_checkpoint(f"{d}/c", state)
            assert meta_d["epoch"] == 3 and meta_d["best_metric"] == 0.5
            a = jax.tree.leaves(state.params)[0]
            b = jax.tree.leaves(meta_d["state"].params)[0]
            assert np.allclose(a, b)

    @test("device augment pipeline (uint8 → normalized)")
    def t14():
        aug = make_device_augment(cfg, train=True)
        raw = {"image": jnp.asarray((np.asarray(x) * 255).astype(np.uint8)),
               "label": jnp.zeros((4,), jnp.int32),
               "metadata": jnp.zeros((4, 13))}
        out = jax.jit(aug)(raw, jax.random.key(0))
        assert out["image"].shape == (4, 32, 32, 3)

    for fn in (t1, t2, t3, t4, t5, t6, t7, t8, t9, t10, t11, t12, t13, t14):
        fn()

    n_pass = sum(1 for v in RESULTS.values() if v == "PASS")
    print(f"\n{'='*50}\n  {n_pass}/{len(RESULTS)} tests passed\n{'='*50}")
    if n_pass < len(RESULTS):
        for k, v in RESULTS.items():
            if v != "PASS":
                print(f"  FAILED: {k} — {v}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
