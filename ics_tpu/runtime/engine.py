"""TPU inference engine: one compiled step per (model, batch-bucket).

The compiled step is the fused pipeline: uint8 canvas -> on-device
resize/crop/normalize (MXU matmuls) -> folded-BN forward -> softmax/top-k.
Batch buckets keep XLA shapes static; requests are padded up to the nearest
bucket (north-star dynamic-batching design, BASELINE.json).
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ics_tpu.models.registry import ModelSpec, get_model
from ics_tpu.ops.preproc import preprocess_batch

logger = logging.getLogger(__name__)

TOP_K = 5
# saliency maps come back on a fixed GxG grid regardless of image_size
# (one response shape for the whole zoo; clients scale it over the image)
EXPLAIN_GRID = 16


def _cast_pytree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tree
    )


class InferenceEngine:
    """Synchronous engine; the async batcher drives it via a thread."""

    def __init__(
        self,
        model_name: str,
        num_classes: int = 1000,
        precision: str = "bf16",
        buckets: Sequence[int] = (1, 8, 32, 128),
        canvas: int = 512,
        seed: int = 0,
        variables: Optional[dict] = None,
        mesh=None,
        multi_label: bool = False,
        pp_microbatches: int = 4,
    ):
        self.spec: ModelSpec = get_model(model_name)
        self.model = self.spec.build(num_classes=num_classes)
        self.model_name = model_name
        self.num_classes = num_classes
        self.precision = precision
        # multi-label models (multipla_escolha fine-tunes) score with
        # independent per-class sigmoids — softmax would force the classes
        # to compete, contradicting the BCE training objective
        self.multi_label = bool(multi_label)
        self.dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
        if mesh is not None and "data" in getattr(mesh, "axis_names", ()):
            # sharded serving: every bucket must divide over the data axis
            data_size = int(mesh.shape["data"])
            buckets = {
                max(((b + data_size - 1) // data_size) * data_size, data_size)
                for b in buckets
            }
        # pipeline-parallel serving (TPU_PP_STAGES -> ('pp',) mesh): the
        # transformer trunk is split across the pp devices and microbatches
        # flow stage-to-stage (parallel/pipeline.py). ViT-family only —
        # the schedule needs a homogeneous stackable block trunk.
        self.pp_microbatches = 0
        if mesh is not None and "pp" in getattr(mesh, "axis_names", ()):
            stages = int(mesh.shape["pp"])
            blocks = getattr(self.model, "blocks", None)
            if not (blocks and hasattr(self.model, "patch_embed")
                    and hasattr(self.model, "ln")):
                raise ValueError(
                    f"TPU_PP_STAGES: modelo {model_name!r} não tem tronco "
                    "transformer homogêneo (família ViT) — pipeline "
                    "parallelism não se aplica"
                )
            depth = len(blocks)
            if depth % stages:
                raise ValueError(
                    f"TPU_PP_STAGES={stages} não divide a profundidade "
                    f"{depth} de {model_name!r}"
                )
            m = max(1, int(pp_microbatches))
            self.pp_microbatches = m
            # every bucket must split into whole microbatches
            buckets = {max(((b + m - 1) // m) * m, m) for b in buckets}
        self.buckets = tuple(sorted(buckets))
        self.canvas = canvas
        if variables is None:
            variables = self.model.init(jax.random.PRNGKey(seed))
        self.variables = variables
        folded = self.model.fold(variables)
        self.mesh = mesh
        self.folded = _cast_pytree(folded, self.dtype)
        if mesh is not None:
            # multi-chip serving: batch sharded over 'data', params
            # replicated EXCEPT the classifier head, which shards its
            # classes dim over 'model' when the mesh has a TP axis —
            # GSPMD inserts the head all-gather before softmax/top-k, so
            # TPU_MESH_SHAPE=4,2 gives real DP x TP serving, not a dead
            # axis (VERDICT r1 §2.3 TP row). Collectives ride ICI.
            from ics_tpu.parallel.mesh import shard_head_for_tp

            self.folded = jax.device_put(
                self.folded, shard_head_for_tp(mesh, self.folded)
            )
        else:
            self.folded = jax.device_put(self.folded)
        # the tree the compiled serving step receives: plain folded params,
        # except under PP where the trunk is PRE-staged to [S, per, ...]
        # and placed sharded over 'pp' ONCE here — stacking inside the
        # step would copy the whole trunk's params every call, and the
        # sharded placement keeps 1/S of the trunk per device with no
        # per-call collective (review r5)
        self._step_folded = self.folded
        if self.pp_microbatches:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ics_tpu.parallel.pipeline import stage_block_params

            staged = stage_block_params(
                self.folded["blocks"], int(mesh.shape["pp"])
            )
            staged = jax.device_put(
                staged,
                jax.tree_util.tree_map(
                    lambda _: NamedSharding(mesh, P("pp")), staged
                ),
            )
            pp_folded = {
                k: v for k, v in self.folded.items() if k != "blocks"
            }
            pp_folded["blocks_staged"] = staged
            self._step_folded = pp_folded
        self._step = None
        self._compiled_shapes: set[tuple[int, int]] = set()
        self._stats = {
            "batches": 0, "images": 0, "total_device_ms": 0.0, "compiles": 0,
        }

    def _record_step(self, key, dt_ms: float, n: int,
                     record: bool = True) -> None:
        """Uniform stats recording for every compiled-step flavor: the
        FIRST call on a shape key is a compile (counted, excluded from
        total_device_ms — a ~40 s remote-tunnel compile wholesale in the
        device-time telemetry made ms/batch unusable after restarts);
        ``record=False`` keeps warmup traffic out of batches/images
        (self-review r3)."""
        new_shape = key not in self._compiled_shapes
        self._compiled_shapes.add(key)
        if not record:
            return
        self._stats["batches"] += 1
        self._stats["images"] += n
        if new_shape:
            self._stats["compiles"] += 1
        else:
            self._stats["total_device_ms"] += dt_ms

    def _top_k(self) -> int:
        # multi-label: every class's sigmoid score is an independent
        # decision, so truncating at TOP_K could silently drop options at
        # or above the serving threshold — return ALL classes (ambiente
        # option counts are small). Softmax serving keeps the top-k cap.
        if self.multi_label:
            return self.num_classes
        return min(TOP_K, self.num_classes)

    # -- compiled step -----------------------------------------------------
    def _make_step(self):
        model = self.model
        spec = self.spec
        dtype = self.dtype
        multi_label = self.multi_label

        k = self._top_k()

        if self.pp_microbatches:
            # pipeline-parallel step: trunk over the 'pp' axis (GPipe
            # fill-drain via ppermute), inputs/params replicated — the
            # per-stage split happens inside pipeline_blocks' shard_map.
            # DP composes via TPU_SERVING_REPLICAS, not this mesh.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ics_tpu.parallel.pipeline import pipeline_vit_forward

            mesh = self.mesh
            m = self.pp_microbatches

            def pp_step(folded, canvas_u8, sizes):
                x = preprocess_batch(
                    canvas_u8, sizes, out_size=spec.image_size,
                    resize_short=spec.resize_short, dtype=dtype,
                )
                logits = pipeline_vit_forward(
                    model, folded, x, mesh, microbatches=m, use_flash=True,
                ).astype(jnp.float32)
                if multi_label:
                    probs = jax.nn.sigmoid(logits)
                else:
                    probs = jax.nn.softmax(logits, axis=-1)
                top_scores, top_idx = jax.lax.top_k(probs, k)
                return top_idx, top_scores

            rep = NamedSharding(mesh, P())
            pp_sh = NamedSharding(mesh, P("pp"))
            folded_sh = jax.tree_util.tree_map(
                lambda _: rep, self._step_folded
            )
            # the pre-staged trunk stays sharded one stage per device —
            # in_specs P('pp') inside pipeline_blocks' shard_map then
            # consumes it with zero data movement
            folded_sh["blocks_staged"] = jax.tree_util.tree_map(
                lambda _: pp_sh, self._step_folded["blocks_staged"]
            )
            # NO input donation here (SURVEY §7 step 8, evaluated r4):
            # donate_argnums only lets XLA alias donated INPUTS to OUTPUTS,
            # and this step's outputs are [B, K] top-k — nothing can absorb
            # the uint8 canvas, so jax warns "donated buffers were not
            # usable" and no memory is saved (docs/benchmarks.md, rejected)
            return jax.jit(
                pp_step,
                in_shardings=(folded_sh, rep, rep),
                out_shardings=(rep, rep),
            )

        def step(folded, canvas_u8, sizes):
            x = preprocess_batch(
                canvas_u8, sizes, out_size=spec.image_size,
                resize_short=spec.resize_short, dtype=dtype,
            )
            logits = model.apply_folded(folded, x).astype(jnp.float32)
            if multi_label:
                probs = jax.nn.sigmoid(logits)
            else:
                probs = jax.nn.softmax(logits, axis=-1)
            top_scores, top_idx = jax.lax.top_k(probs, k)
            return top_idx, top_scores

        if self.mesh is not None:
            from ics_tpu.parallel.mesh import batch_sharding, shard_head_for_tp

            folded_sh = shard_head_for_tp(self.mesh, self.folded)
            data4 = batch_sharding(self.mesh, 4)
            data2 = batch_sharding(self.mesh, 2)
            return jax.jit(
                step,
                in_shardings=(folded_sh, data4, data2),
                out_shardings=(data2, data2),
            )
        # no input donation: rejected lever, see the pp_step note above
        return jax.jit(step)

    def _get_step(self):
        if self._step is None:
            self._step = self._make_step()
        return self._step

    def _get_coeff_step(self, mode: str = "420"):
        """Fused decode-on-TPU step (JPEG coefficients in, top-k out).

        One jitted callable per sampling mode; jax.jit's shape cache covers
        the (batch bucket, luma bucket) variants within a mode."""
        if self.pp_microbatches:
            # decode-on-TPU lanes run the trunk non-pipelined, which is
            # exactly what a PP deployment can't do (the model doesn't fit
            # one stage); the service disables device decode under PP
            raise RuntimeError(
                "decode-on-TPU indisponível com pipeline parallelism "
                "(TPU_PP_STAGES) — o serviço usa decode no host"
            )
        if getattr(self, "_coeff_steps", None) is None:
            self._coeff_steps: dict = {}
        if mode not in self._coeff_steps:
            from ics_tpu.runtime.device_decode import (
                make_fused_decode_infer_step,
            )

            self._coeff_steps[mode] = make_fused_decode_infer_step(
                self.model, self.folded, self.spec, dtype=self.dtype,
                mesh=self.mesh, top_k=self._top_k(),
                mode=mode, multi_label=self.multi_label,
            )
        return self._coeff_steps[mode]

    def predict_coeff_staged_async(
        self, staged: dict, mode: str = "420", record: bool = True
    ):
        """Dispatch a staged coefficient batch WITHOUT fetching — the coeff
        lanes' twin of :meth:`predict_staged_async` (same pipelined-flush
        contract: returns a zero-arg resolver)."""
        n = staged["y"].shape[0]
        bucket = self.bucket_for(n)
        if n < bucket:
            pad = bucket - n
            staged = {
                k: np.concatenate(
                    [v, np.zeros((pad, *v.shape[1:]), v.dtype)]
                )
                for k, v in staged.items()
            }
            # zero quant tables make padded rows decode to zeros; give the
            # padded sizes a sane nonzero extent for the resize plan
            staged["sizes"][n:] = 64
        step = self._get_coeff_step(mode)
        t0 = time.perf_counter()
        idx, scores = step(
            staged["y"], staged["yq"], staged["cb"], staged["cq"],
            staged["cr"], staged["rq"], staged["sizes"],
        )
        shape_key = ("coeff", mode, staged["y"].shape[1], bucket)

        def resolve() -> tuple[np.ndarray, np.ndarray]:
            i = np.asarray(idx)[:n]
            s = np.asarray(scores)[:n]
            self._record_step(
                shape_key, (time.perf_counter() - t0) * 1000, n,
                record=record,
            )
            return i, s

        return resolve

    def predict_coeff_staged(
        self, staged: dict, mode: str = "420", record: bool = True
    ) -> tuple[np.ndarray, np.ndarray]:
        """Staged coefficient batch (see runtime.device_decode) -> top-k.

        Pads to the nearest batch bucket like the pixel path."""
        return self.predict_coeff_staged_async(staged, mode, record)()

    # -- test-time augmentation ----------------------------------------------
    def _require_no_pp(self, what: str) -> None:
        """The diagnostic steps (TTA/explain/embed) run the FULL trunk in
        one plain jit — under pipeline parallelism the model by premise
        doesn't fit one stage, so reaching them would OOM a device and
        could wedge serving. Fail cleanly instead (same posture as
        :meth:`_get_coeff_step`)."""
        if self.pp_microbatches:
            raise RuntimeError(
                f"{what} indisponível com pipeline parallelism "
                "(TPU_PP_STAGES) — o passo roda o tronco inteiro "
                "não-pipelinado em um device"
            )

    def _get_tta_step(self):
        """Compiled TTA step: average class probabilities over the image
        and its horizontal flip — one fused graph (the flip is a reverse
        on the width axis AFTER preproc, so decode/staging cost nothing
        extra; the forward runs on a 2N batch)."""
        self._require_no_pp("TTA")
        if getattr(self, "_tta_step", None) is None:
            model = self.model
            spec = self.spec
            dtype = self.dtype
            multi_label = self.multi_label
            k = self._top_k()

            def step(folded, canvas_u8, sizes):
                x = preprocess_batch(
                    canvas_u8, sizes, out_size=spec.image_size,
                    resize_short=spec.resize_short, dtype=dtype,
                )
                x2 = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
                logits = model.apply_folded(folded, x2).astype(jnp.float32)
                if multi_label:
                    probs = jax.nn.sigmoid(logits)
                else:
                    probs = jax.nn.softmax(logits, axis=-1)
                n = x.shape[0]
                probs = (probs[:n] + probs[n:]) * 0.5
                top_scores, top_idx = jax.lax.top_k(probs, k)
                return top_idx, top_scores

            self._tta_step = jax.jit(step)
        return self._tta_step

    def predict_staged_tta(
        self, canvas: np.ndarray, sizes: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Flip-averaged twin of :func:`predict_staged` (2x device FLOPs
        for measurably steadier suggestion scores — opt-in per request)."""
        n = canvas.shape[0]
        bucket = self.bucket_for(n)
        if n < bucket:
            canvas = np.concatenate(
                [canvas, np.zeros((bucket - n, *canvas.shape[1:]), np.uint8)]
            )
            sizes = np.concatenate(
                [sizes, np.full((bucket - n, 2), 256, np.int32)]
            )
        step = self._get_tta_step()
        t0 = time.perf_counter()
        idx, scores = step(self.folded, canvas, sizes)
        idx = np.asarray(idx)[:n]
        scores = np.asarray(scores)[:n]
        # via _record_step so the first cold compile (minutes over the
        # remote-compile tunnel) counts as a compile, not device time
        self._record_step(
            ("tta", bucket, canvas.shape[1]),
            (time.perf_counter() - t0) * 1000, n,
        )
        return idx, scores

    # -- explainability ------------------------------------------------------
    # allowed SmoothGrad sample counts: one compiled graph per value, so
    # the request parameter quantizes UP into this small static set
    EXPLAIN_SMOOTH_BUCKETS = (1, 4, 8, 16)

    @classmethod
    def quantize_smooth(cls, n: int) -> int:
        """The ONE place the sample-count quantization rule lives —
        callers reporting the effective count must use this, not re-walk
        the bucket list."""
        for b in cls.EXPLAIN_SMOOTH_BUCKETS:
            if n <= b:
                return b
        return cls.EXPLAIN_SMOOTH_BUCKETS[-1]

    def _get_explain_step(self, n_samples: int = 1):
        """Compiled saliency step (net-new — the reference classifies but
        never explains): forward + input-gradient in ONE fused graph.

        The saliency of class c is |d logit_c / d x| reduced over channels
        (max-abs — the standard vanilla-gradient map), computed against the
        PREPROCESSED input so the map lives in model-view coordinates, then
        bilinearly resized to a fixed ``EXPLAIN_GRID``² grid in-graph (any
        image_size, one response shape) and min-max normalized to [0, 1].
        ``class_idx < 0`` explains the model's own top class (chosen from
        the CLEAN forward, under stop_gradient — no second pass).

        ``n_samples > 1`` is SmoothGrad (Smilkov et al., arXiv:1706.03825):
        the image is replicated into a batch of ``n`` copies with Gaussian
        noise (sigma = 10% of the image's value span; copy 0 stays clean
        and drives the top-k), ALL sample gradients come out of the one
        batched backward, and the map averages them — vanilla-gradient
        speckle cancels at ~n× device FLOPs, still one graph."""
        self._require_no_pp("explicar (saliência)")
        steps = getattr(self, "_explain_steps", None)
        if steps is None:
            steps = self._explain_steps = {}
        if n_samples not in steps:
            model = self.model
            spec = self.spec
            dtype = self.dtype
            multi_label = self.multi_label
            k = self._top_k()
            n = n_samples

            def step(folded, canvas_u8, sizes, class_idx, key):
                x = preprocess_batch(
                    canvas_u8, sizes, out_size=spec.image_size,
                    resize_short=spec.resize_short, dtype=dtype,
                )
                x0 = x[0]
                if n == 1:
                    xs = x0[None]
                else:
                    span = (jnp.max(x0) - jnp.min(x0)).astype(jnp.float32)
                    noise = (0.1 * span) * jax.random.normal(
                        key, (n,) + x0.shape, jnp.float32
                    )
                    noise = noise.at[0].set(0.0)  # clean copy: top-k source
                    xs = x0[None] + noise.astype(x0.dtype)

                def target_of(xb):
                    logits = model.apply_folded(
                        folded, xb
                    ).astype(jnp.float32)
                    clean = logits[0]
                    cls = jnp.where(
                        class_idx >= 0,
                        jnp.clip(class_idx, 0, clean.shape[0] - 1),
                        jnp.argmax(clean),
                    )
                    cls = jax.lax.stop_gradient(cls)
                    # sum over samples: one backward yields each copy's
                    # own gradient (samples are independent rows)
                    return jnp.sum(logits[:, cls]), clean

                (_, clean_logits), g = jax.value_and_grad(
                    target_of, has_aux=True
                )(xs)
                heat = jnp.mean(
                    jnp.max(jnp.abs(g.astype(jnp.float32)), axis=-1), axis=0
                )
                heat = jax.image.resize(
                    heat, (EXPLAIN_GRID, EXPLAIN_GRID), "linear"
                )
                lo = jnp.min(heat)
                hi = jnp.max(heat)
                heat = (heat - lo) / jnp.maximum(hi - lo, 1e-12)
                if multi_label:
                    probs = jax.nn.sigmoid(clean_logits)
                else:
                    probs = jax.nn.softmax(clean_logits, axis=-1)
                top_scores, top_idx = jax.lax.top_k(probs, k)
                return top_idx, top_scores, heat

            steps[n_samples] = jax.jit(step)
        return steps[n_samples]

    def explain_staged(
        self, canvas: np.ndarray, sizes: np.ndarray,
        class_idx: int = -1, smooth_samples: int = 1, seed: int = 0,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """One image (row 0) -> (top_idx [K], top_scores [K], heat [G, G]).

        ``smooth_samples`` quantizes UP into EXPLAIN_SMOOTH_BUCKETS (one
        compiled graph per value). Only row 0 of ``canvas`` is explained;
        the noisy copies are built in model-view space on device."""
        smooth_samples = self.quantize_smooth(smooth_samples)
        step = self._get_explain_step(smooth_samples)
        t0 = time.perf_counter()
        idx, scores, heat = step(
            self.folded, canvas[:1], sizes[:1], jnp.int32(class_idx),
            jax.random.PRNGKey(seed),
        )
        self._record_step(
            ("explain", smooth_samples, canvas.shape[1]),
            (time.perf_counter() - t0) * 1000, 1,
        )
        # top_k ran on the clean 1-D logits row: idx/scores are already [K]
        return np.asarray(idx), np.asarray(scores), np.asarray(heat)

    # -- embeddings ----------------------------------------------------------
    @property
    def embed_dim(self) -> int:
        """Backbone feature width = the classifier head's input dim."""
        return int(self.folded["head"]["w"].shape[0])

    def _get_embed_step(self):
        """Compiled embed step: canvas -> L2-normalized backbone features.

        Features are extracted generically by swapping the classifier head
        for the identity (every zoo family ends with ``head.apply(folded
        ['head'], feats)`` on a Dense head, so ``w=I, b=0`` makes
        ``apply_folded`` return the penultimate features verbatim) — one
        mechanism for all model families, no per-model feature plumbing.
        The DxD identity matmul is noise next to the backbone."""
        self._require_no_pp("embeddings")
        if getattr(self, "_embed_step", None) is None:
            d = self.embed_dim
            if self.mesh is not None:
                # backbone leaves are committed to the mesh; the identity
                # head must be placed there too (replicated) or jit
                # rejects the mixed-commitment argument tree
                from ics_tpu.parallel.mesh import replicated_sharding

                rep = replicated_sharding(self.mesh)
                eye = jax.device_put(jnp.eye(d, dtype=self.dtype), rep)
                zeros = jax.device_put(jnp.zeros((d,), self.dtype), rep)
            else:
                eye = jax.device_put(jnp.eye(d, dtype=self.dtype))
                zeros = jax.device_put(jnp.zeros((d,), self.dtype))
            folded_embed = dict(self.folded)
            folded_embed["head"] = {"w": eye, "b": zeros}
            model = self.model
            spec = self.spec
            dtype = self.dtype

            def step(folded, canvas_u8, sizes):
                x = preprocess_batch(
                    canvas_u8, sizes, out_size=spec.image_size,
                    resize_short=spec.resize_short, dtype=dtype,
                )
                feats = model.apply_folded(folded, x).astype(jnp.float32)
                norm = jnp.linalg.norm(feats, axis=-1, keepdims=True)
                return feats / jnp.maximum(norm, 1e-8)

            self._embed_folded = folded_embed
            if self.mesh is not None:
                # DP embed: batch shards over 'data' (bulk indexing runs
                # at full-mesh throughput), params replicated
                from ics_tpu.parallel.mesh import batch_sharding

                folded_sh = jax.tree_util.tree_map(
                    lambda _: rep, folded_embed
                )
                self._embed_step = jax.jit(
                    step,
                    in_shardings=(
                        folded_sh,
                        batch_sharding(self.mesh, 4),
                        batch_sharding(self.mesh, 2),
                    ),
                    out_shardings=batch_sharding(self.mesh, 2),
                )
            else:
                self._embed_step = jax.jit(step)
        return self._embed_step

    def embed_staged(
        self, canvas: np.ndarray, sizes: np.ndarray
    ) -> np.ndarray:
        """canvas uint8 [N<=bucket, C, C, 3] -> L2-normalized features
        [N, D] float32 (cosine similarity = plain dot product)."""
        n = canvas.shape[0]
        bucket = self.bucket_for(n)
        if n < bucket:
            canvas = np.concatenate(
                [canvas, np.zeros((bucket - n, *canvas.shape[1:]), np.uint8)]
            )
            sizes = np.concatenate(
                [sizes, np.full((bucket - n, 2), 256, np.int32)]
            )
        step = self._get_embed_step()
        t0 = time.perf_counter()
        feats = step(self._embed_folded, canvas, sizes)
        feats = np.asarray(feats)[:n]
        self._record_step(
            ("embed", bucket, canvas.shape[1]),
            (time.perf_counter() - t0) * 1000, n,
        )
        return feats

    def bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def warmup(self, buckets: Optional[Sequence[int]] = None) -> None:
        step = self._get_step()
        for b in buckets or self.buckets:
            canvas = np.zeros((b, self.canvas, self.canvas, 3), np.uint8)
            sizes = np.full((b, 2), 256, np.int32)
            idx, _ = step(self._step_folded, canvas, sizes)
            jax.block_until_ready(idx)
            self._compiled_shapes.add((b, self.canvas))
            logger.info("compiled %s step for bucket %d", self.model_name, b)

    def warmup_coeff(self, mode: str = "420", luma_blocks: int = 64,
                     buckets: Optional[Sequence[int]] = None) -> None:
        """Pre-compile the fused decode-on-TPU lane (default: 4:2:0 at the
        512px bucket — the dominant wild JPEG shape). Without this, the
        first device-decode flush in production pays the cold compile
        inline (~40s measured over the remote-compile tunnel)."""
        from ics_tpu.runtime.device_decode import _chroma_canvas

        cv, ch = _chroma_canvas(mode, luma_blocks)
        for b in buckets or self.buckets:
            staged = {
                "y": np.zeros((b, luma_blocks, luma_blocks, 64), np.int16),
                "cb": np.zeros((b, cv, ch, 64), np.int16),
                "cr": np.zeros((b, cv, ch, 64), np.int16),
                "yq": np.zeros((b, 64), np.uint16),
                "cq": np.zeros((b, 64), np.uint16),
                "rq": np.zeros((b, 64), np.uint16),
                "sizes": np.full((b, 2), 64, np.int32),
            }
            self.predict_coeff_staged(staged, mode=mode, record=False)
            logger.info(
                "compiled %s decode lane %s/%dpx for bucket %d",
                self.model_name, mode, luma_blocks * 8, b,
            )

    # -- public -------------------------------------------------------------
    def predict_staged_async(self, canvas: np.ndarray, sizes: np.ndarray):
        """Dispatch the staged batch WITHOUT fetching results.

        Pads to the batch bucket, enqueues H2D + the compiled step (jax
        dispatch returns immediately), and returns a zero-arg resolver that
        performs the blocking D2H fetch and records step telemetry. The
        pipelined batcher flush uses this to stage + transfer batch N+1
        while batch N still computes on device (SURVEY §7 step 8,
        "H2D overlap"); ``predict_staged`` below is the synchronous form.
        """
        n = canvas.shape[0]
        bucket = self.bucket_for(n)
        if n < bucket:
            canvas = np.concatenate(
                [canvas, np.zeros((bucket - n, *canvas.shape[1:]), np.uint8)]
            )
            sizes = np.concatenate(
                [sizes, np.full((bucket - n, 2), 256, np.int32)]
            )
        step = self._get_step()
        # mixed-resolution bucketing (BASELINE cfg 4): jax.jit caches one
        # graph per (batch_bucket, canvas) shape; stage_batch quantizes the
        # canvas side to a small bucket set, bounding the compile count
        t0 = time.perf_counter()
        idx, scores = step(self._step_folded, canvas, sizes)
        shape_key = (bucket, canvas.shape[1])

        def resolve() -> tuple[np.ndarray, np.ndarray]:
            i = np.asarray(idx)[:n]
            s = np.asarray(scores)[:n]
            self._record_step(
                shape_key, (time.perf_counter() - t0) * 1000, n
            )
            return i, s

        return resolve

    def predict_staged(
        self, canvas: np.ndarray, sizes: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """canvas uint8 [N<=bucket, C, C, 3] -> (top_idx, top_scores) [N, K]."""
        return self.predict_staged_async(canvas, sizes)()

    def status(self) -> dict:
        return {
            "enabled": True,
            "model": self.model_name,
            "precision": self.precision,
            "buckets": list(self.buckets),
            "backend": jax.default_backend(),
            # replica-pinned engines (runtime.hedging) must report THEIR
            # mesh's capacity, not the whole host's device count (review r5)
            "devices": (
                int(self.mesh.devices.size) if self.mesh is not None
                else len(jax.devices())
            ),
            **self._stats,
        }
