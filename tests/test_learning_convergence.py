"""The fine-tune loop actually LEARNS — not just runs.

Every other training test asserts mechanics (steps, checkpoints, routes)
on noise JPEGs where accuracy is meaningless. This one builds a
color-separable dataset (class 0 red-dominant, class 1 blue-dominant,
heavy pixel noise), fine-tunes the CI model and requires the HELD-OUT
split to be classified correctly — through both the training-eval path
and the folded bf16-style serving path (fold correctness under genuinely
trained BN statistics, not random init).
"""

import io

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image as PILImage

from ics_tpu.models.resnet import resnet_tiny
from ics_tpu.train.data import batch_iterator, split_examples
from ics_tpu.train.finetune import (
    FineTuner,
    make_optimizer,
    make_preproc_eval_step,
)


def make_color_jpeg(seed: int, label: int, size=(64, 64)) -> bytes:
    rng = np.random.default_rng(seed)
    base = np.zeros((size[1], size[0], 3), np.float32)
    base[..., 0 if label == 0 else 2] = 180.0  # red vs blue dominant
    img = np.clip(base + rng.normal(0, 40, base.shape), 0, 255)
    buf = io.BytesIO()
    PILImage.fromarray(img.astype(np.uint8)).save(buf, "JPEG", quality=85)
    return buf.getvalue()


def test_finetune_learns_separable_classes():
    blobs, examples = {}, []
    for i in range(48):
        label = i % 2
        h = f"h{i}"
        blobs[h] = make_color_jpeg(i, label)
        examples.append(
            {"content_hash": h, "caminho_img": f"f/{i}.jpg", "label": label}
        )
    train, held = split_examples(examples, eval_fraction=1 / 6, seed=0)
    assert len(held) == 8 and len({e["label"] for e in held}) == 2

    model = resnet_tiny(num_classes=2)
    variables = model.init(jax.random.PRNGKey(0))
    tuner = FineTuner(
        model, make_optimizer(lr=0.05), image_size=64, resize_short=64,
        compute_dtype=jnp.float32,
    )
    fetch = lambda h, p: blobs[h]  # noqa: E731
    batches = batch_iterator(
        train, fetch, batch_size=8, canvas=64, epochs=None, seed=0
    )
    variables, _, hist = tuner.run(variables, batches, max_steps=80)
    assert hist[-1]["accuracy"] >= 0.9  # train accuracy converged

    # held-out accuracy through the training-eval step
    step = make_preproc_eval_step(model, 64, 64, jnp.float32)
    eval_batches = list(batch_iterator(
        held, fetch, batch_size=8, canvas=64, shuffle=False, epochs=1,
        with_counts=True,
    ))
    correct = total = 0
    for cv, sz, lb, n in eval_batches:
        valid = jnp.arange(lb.shape[0]) < n
        c, t = step(variables, cv, sz, lb, valid)
        correct += int(c)
        total += int(t)
    assert total == 8
    # >= 7/8: at 80 steps both device-count variants reach 8/8,
    # but the BN eval-mode boundary can flip one knife-edge example
    # under different XLA partitioning (measured: 30 steps was 8/8
    # on 1 device and 3/8 on 8 virtual devices — undertrained BN)
    assert correct / total >= 0.875, f"eval accuracy {correct}/{total}"

    # and through the FOLDED serving path (what classificar-tpu runs):
    # folding trained BN stats must preserve the decisions
    from ics_tpu.ops.preproc import preprocess_batch

    folded = model.fold(variables)
    f_correct = 0
    for cv, sz, lb, n in eval_batches:
        x = preprocess_batch(cv, sz, out_size=64, resize_short=64,
                             dtype=jnp.float32)
        logits = model.apply_folded(folded, x)
        pred = np.asarray(jnp.argmax(logits, -1))[:n]
        f_correct += int((pred == np.asarray(lb)[:n]).sum())
    assert f_correct / total >= 0.875, f"folded accuracy {f_correct}/{total}"
