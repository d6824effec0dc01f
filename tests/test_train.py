"""Fine-tune loop tests: labeled dataset from DB, checkpoint/resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_tpu.core import timezone as tz
from ics_tpu.db.engine import Database
from ics_tpu.db.models import (
    Ambiente,
    AmbienteConjuntoImagens,
    Classificacao,
    ConjuntoImagens,
    Imagem,
    Opcao,
    TipoUsuario,
    Usuario,
    UsuarioAdministrador,
    UsuarioConvencional,
)
from ics_tpu.models.resnet import ResNet
from ics_tpu.train.data import batch_iterator, labeled_examples
from ics_tpu.train.finetune import FineTuner, make_optimizer

from tests.fake_nextcloud import make_jpeg


@pytest.fixture()
def labeled_db(tmp_path):
    db = Database(f"sqlite:///{tmp_path}/train.db")
    db.create_all()
    now = tz.utcnow()
    blobs = {}
    with db.session() as s:
        s.add(TipoUsuario(id_tipo=1, nome="convencional"))
        s.add(TipoUsuario(id_tipo=2, nome="admin"))
        user = Usuario(nome_completo="A B", email="a@b.c", senha_hash="h",
                       data_criado=now, id_tipo=2)
        s.add(user)
        s.flush()
        adm = UsuarioAdministrador(cpf="1" * 11, id_usu=user.id_usu)
        s.add(adm)
        user2 = Usuario(nome_completo="C D", email="c@d.e", senha_hash="h",
                        data_criado=now, id_tipo=1)
        s.add(user2)
        s.flush()
        con = UsuarioConvencional(cpf="2" * 11, id_usu=user2.id_usu)
        s.add(con)
        cnj = ConjuntoImagens(nome_conj="f", caminho_conj="/f", file_id="1",
                              data_proc=now, data_sinc=now)
        s.add(cnj)
        s.flush()
        amb = Ambiente(titulo_amb="T", descricao_questionario="d",
                       data_criado=now, id_adm=adm.id_adm)
        s.add(amb)
        s.flush()
        s.add(AmbienteConjuntoImagens(id_amb=amb.id_amb, id_cnj=cnj.id_cnj,
                                      data_associado=now))
        op1 = Opcao(texto="gato", id_amb=amb.id_amb)
        op2 = Opcao(texto="cão", id_amb=amb.id_amb)
        s.add_all([op1, op2])
        s.flush()
        from ics_tpu.core.security import sha256_hex

        for i in range(8):
            data = make_jpeg(i, size=(80, 60))
            h = sha256_hex(data)
            blobs[h] = data
            s.add(Imagem(content_hash=h, nome_img=f"{i}.jpg",
                         caminho_img=f"f/{i}.jpg", data_proc=now,
                         data_sinc=now, id_cnj=cnj.id_cnj))
            s.add(Classificacao(
                id_con=con.id_con, id_img=h,
                id_opc=op1.id_opc if i % 2 == 0 else op2.id_opc,
                data_criado=now, ativo=True,
            ))
        s.commit()
        amb_id = amb.id_amb
    return db, amb_id, blobs


class TestDataset:
    def test_labeled_examples(self, labeled_db):
        db, amb_id, blobs = labeled_db
        examples, class_map = labeled_examples(db, amb_id)
        assert len(examples) == 8
        assert len(class_map) == 2
        labels = sorted(e["label"] for e in examples)
        assert labels == [0] * 4 + [1] * 4

    def test_batch_iterator_pads_and_decodes(self, labeled_db):
        db, amb_id, blobs = labeled_db
        examples, _ = labeled_examples(db, amb_id)
        batches = list(
            batch_iterator(
                examples, lambda h, p: blobs[h], batch_size=6, canvas=128,
                epochs=1,
            )
        )
        assert len(batches) == 2
        canvas, sizes, labels = batches[0]
        assert canvas.shape == (6, 128, 128, 3)
        assert sizes.shape == (6, 2) and labels.shape == (6,)
        # decoded size is the true image size
        assert tuple(sizes[0]) == (60, 80)


class TestSplit:
    def test_split_deterministic_and_disjoint(self, labeled_db):
        from ics_tpu.train.data import split_examples

        db, amb_id, blobs = labeled_db
        examples, _ = labeled_examples(db, amb_id)
        train, held = split_examples(examples, eval_fraction=0.25, seed=3)
        train2, held2 = split_examples(examples, eval_fraction=0.25, seed=3)
        assert train == train2 and held == held2
        assert len(held) == 2 and len(train) == 6
        keys = {e["content_hash"] for e in train} & {
            e["content_hash"] for e in held
        }
        assert not keys  # disjoint

    def test_split_disabled_below_threshold(self):
        from ics_tpu.train.data import split_examples

        tiny = [{"content_hash": str(i), "label": 0} for i in range(4)]
        train, held = split_examples(tiny, eval_fraction=0.5)
        assert train == tiny and held == []


class TestFineTune:
    def test_finetune_with_checkpoint_resume(self, labeled_db, tmp_path):
        db, amb_id, blobs = labeled_db
        examples, class_map = labeled_examples(db, amb_id)
        model = ResNet(block_counts=(1, 1, 1, 1), num_classes=len(class_map))
        variables = model.init(jax.random.PRNGKey(0))

        tuner = FineTuner(
            model, make_optimizer(lr=0.01), image_size=64, resize_short=72,
            compute_dtype=jnp.float32, checkpoint_dir=tmp_path / "ckpt",
        )
        batches = batch_iterator(
            examples, lambda h, p: blobs[h], batch_size=4, canvas=128,
            epochs=None,
        )
        before = np.array(variables["params"]["head"]["w"])
        variables2, opt_state, history = tuner.run(
            variables, batches, max_steps=3, checkpoint_every=2
        )
        assert len(history) == 3
        assert all(np.isfinite(h["loss"]) for h in history)
        assert tuner.checkpoint.latest_step() == 3
        # params actually moved
        # host COPY before comparison: run() donated the input tree,
        # so the original jax arrays are deleted (and on CPU a
        # zero-copy view would alias the in-place-updated buffer)
        after = variables2["params"]["head"]["w"]
        assert not np.allclose(np.asarray(before), np.asarray(after))
        tuner.checkpoint.close()

        # resume: a fresh tuner picks up from step 3
        tuner2 = FineTuner(
            model, make_optimizer(lr=0.01), image_size=64, resize_short=72,
            compute_dtype=jnp.float32, checkpoint_dir=tmp_path / "ckpt",
        )
        batches2 = batch_iterator(
            examples, lambda h, p: blobs[h], batch_size=4, canvas=128,
            epochs=None, seed=1,
        )
        _, _, history2 = tuner2.run(
            variables, batches2, max_steps=2, checkpoint_every=100
        )
        assert history2[0]["step"] == 4
        tuner2.checkpoint.close()


class TestLrSchedule:
    def test_warmup_cosine_shape(self):
        from ics_tpu.train.finetune import make_lr_schedule

        sched = make_lr_schedule(0.1, 100, kind="cosseno")
        assert float(sched(0)) == 0.0               # warmup starts at 0
        assert abs(float(sched(10)) - 0.1) < 1e-6   # peak at 10% warmup
        assert float(sched(50)) < 0.1               # decaying
        assert abs(float(sched(100)) - 0.001) < 1e-4  # ends at 1% of peak

    def test_constant_passthrough_and_bad_kind(self):
        import pytest as _pytest

        from ics_tpu.train.finetune import make_lr_schedule

        assert make_lr_schedule(0.05, 100, kind="constante") == 0.05
        with _pytest.raises(ValueError, match="agenda_lr"):
            make_lr_schedule(0.05, 100, kind="linear")

    def test_optimizer_accepts_schedule_and_resumes_mid_curve(self):
        """The schedule's step count lives in the optimizer state, so a
        restored opt_state continues the decay instead of re-warming."""
        import jax
        import jax.numpy as jnp
        import optax

        from ics_tpu.train.finetune import make_lr_schedule, make_optimizer

        sched = make_lr_schedule(0.1, 20, kind="cosseno")
        opt = make_optimizer(lr=sched)
        params = {"w": jnp.ones((4, 4))}
        state = opt.init(params)
        g = {"w": jnp.ones((4, 4))}
        for _ in range(5):
            updates, state = opt.update(g, state, params)
            params = optax.apply_updates(params, updates)
        # count advanced with the steps (tree search: any leaf == 5)
        counts = [
            int(x) for x in jax.tree_util.tree_leaves(state)
            if hasattr(x, "dtype") and x.dtype == jnp.int32 and x.ndim == 0
        ]
        assert 5 in counts


class TestLinearProbe:
    def test_probe_updates_head_only_and_freezes_bn_stats(self):
        """treinar_apenas_cabeca: backbone params AND BN running stats must
        stay bit-identical (eval-mode forward), only the head moves."""
        import jax
        import jax.numpy as jnp

        from ics_tpu.models.resnet import resnet_tiny
        from ics_tpu.train.finetune import FineTuner

        model = resnet_tiny(num_classes=2)
        variables = model.init(jax.random.PRNGKey(0))
        tuner = FineTuner(model, image_size=32, resize_short=32,
                          compute_dtype=jnp.float32, linear_probe=True)
        rng = np.random.default_rng(0)
        canvas = rng.integers(0, 256, (4, 64, 64, 3), np.uint8)
        sizes = np.full((4, 2), 48, np.int32)
        labels = np.asarray([0, 1, 0, 1], np.int32)
        before = jax.tree_util.tree_map(np.asarray, variables)
        out_vars, _, history = tuner.run(
            variables, iter([(canvas, sizes, labels)] * 4)
        )
        after = jax.tree_util.tree_map(np.asarray, out_vars)
        # backbone params identical
        for key in ("stem", "stages"):
            for b, a in zip(
                jax.tree_util.tree_leaves(before["params"][key]),
                jax.tree_util.tree_leaves(after["params"][key]),
            ):
                np.testing.assert_array_equal(b, a)
        # BN running stats identical (eval-mode forward)
        for b, a in zip(
            jax.tree_util.tree_leaves(before["state"]),
            jax.tree_util.tree_leaves(after["state"]),
        ):
            np.testing.assert_array_equal(b, a)
        # the head actually moved
        assert not np.allclose(before["params"]["head"]["w"],
                               after["params"]["head"]["w"])
        assert all(np.isfinite(h["loss"]) for h in history)

    def test_probe_with_augmentation_on_mesh(self):
        """The product default path: augment + probe on a device mesh."""
        import jax
        import jax.numpy as jnp

        from ics_tpu.models.resnet import resnet_tiny
        from ics_tpu.ops.augment import AugmentConfig
        from ics_tpu.parallel.mesh import make_mesh
        from ics_tpu.train.finetune import FineTuner

        model = resnet_tiny(num_classes=2)
        variables = model.init(jax.random.PRNGKey(0))
        mesh = make_mesh((2,), ("data",), devices=jax.devices()[:2])
        tuner = FineTuner(model, image_size=32, resize_short=32,
                          compute_dtype=jnp.float32, linear_probe=True,
                          mesh=mesh, augment=AugmentConfig())
        rng = np.random.default_rng(1)
        canvas = rng.integers(0, 256, (4, 64, 64, 3), np.uint8)
        sizes = np.full((4, 2), 48, np.int32)
        labels = np.asarray([0, 1, 0, 1], np.int32)
        before_stem = np.array(variables["params"]["stem"]["conv"]["w"])
        out_vars, _, history = tuner.run(
            variables, iter([(canvas, sizes, labels)] * 2)
        )
        np.testing.assert_array_equal(
            before_stem, np.asarray(out_vars["params"]["stem"]["conv"]["w"])
        )
        assert len(history) == 2
        assert all(np.isfinite(h["loss"]) for h in history)


class TestOptimizerKinds:
    def test_adamw_trains_and_moves_params(self):
        from ics_tpu.models.resnet import resnet_tiny

        model = resnet_tiny(num_classes=2)
        variables = model.init(jax.random.PRNGKey(0))
        tuner = FineTuner(
            model, optimizer=make_optimizer(lr=1e-3, kind="adamw"),
            image_size=32, resize_short=32, compute_dtype=jnp.float32,
        )
        rng = np.random.default_rng(0)
        canvas = rng.integers(0, 256, (4, 64, 64, 3), np.uint8)
        sizes = np.full((4, 2), 48, np.int32)
        labels = np.asarray([0, 1, 0, 1], np.int32)
        before = np.array(variables["params"]["stem"]["conv"]["w"])
        out_vars, _, history = tuner.run(
            variables, iter([(canvas, sizes, labels)] * 2)
        )
        assert not np.allclose(
            before, np.asarray(out_vars["params"]["stem"]["conv"]["w"])
        )
        assert all(np.isfinite(h["loss"]) for h in history)

    def test_unknown_kind_rejected(self):
        with pytest.raises(ValueError, match="otimizador"):
            make_optimizer(kind="lion")

    def test_adamw_decay_skips_1d_params(self):
        """With zero grads, AdamW's decoupled decay must shrink matrices
        but leave biases/norm params (1-D) untouched."""
        import optax

        params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
        opt = make_optimizer(lr=0.1, kind="adamw", weight_decay=0.5)
        state = opt.init(params)
        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        updates, _ = opt.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        assert float(jnp.max(jnp.abs(new["b"] - 1.0))) == 0.0
        assert float(jnp.max(new["w"])) < 1.0


class TestEma:
    def test_ema_matches_manual_shadow(self):
        """3 SGD steps on a scalar quadratic: the transform's shadow must
        equal the hand-computed EMA of post-update params exactly."""
        import optax

        from ics_tpu.train.finetune import (
            ema_params_transform,
            find_ema_params,
        )

        decay = 0.9
        opt = optax.chain(optax.sgd(0.1), ema_params_transform(decay))
        params = {"x": jnp.asarray(4.0)}
        state = opt.init(params)
        manual_ema = 4.0
        for _ in range(3):
            grads = {"x": 2.0 * params["x"]}  # d/dx x^2
            updates, state = opt.update(grads, state, params)
            params = optax.apply_updates(params, updates)
            manual_ema = decay * manual_ema + (1 - decay) * float(params["x"])
        shadow = find_ema_params(state)
        assert shadow is not None
        np.testing.assert_allclose(float(shadow["x"]), manual_ema, rtol=1e-6)

    def test_replace_ema_params_reanchors_shadow(self):
        """ADVICE r3: the early-stopping best snapshot pairs best-step
        weights with the FINAL step's opt_state — replace_ema_params must
        swap the EmaState shadow for the snapshot params while leaving
        every other optimizer leaf (SGD momentum here) untouched, and the
        rebuilt state must still round-trip through opt.update."""
        import optax

        from ics_tpu.train.finetune import (
            ema_params_transform,
            find_ema_params,
            replace_ema_params,
        )

        opt = optax.chain(
            optax.sgd(0.1, momentum=0.9), ema_params_transform(0.9)
        )
        params = {"x": jnp.asarray(4.0)}
        state = opt.init(params)
        for _ in range(2):
            grads = {"x": 2.0 * params["x"]}
            updates, state = opt.update(grads, state, params)
            params = optax.apply_updates(params, updates)
        snapshot = {"x": jnp.asarray(1.25)}
        rebuilt = replace_ema_params(state, snapshot)
        # shadow re-anchored on the snapshot, exact
        np.testing.assert_allclose(
            float(find_ema_params(rebuilt)["x"]), 1.25
        )
        # non-EMA leaves (momentum trace) byte-identical
        old_momentum = jax.tree_util.tree_leaves(state[0])
        new_momentum = jax.tree_util.tree_leaves(rebuilt[0])
        for a, b in zip(old_momentum, new_momentum):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # tree structure preserved: the rebuilt state still updates
        updates, _ = opt.update({"x": 2.0 * params["x"]}, rebuilt, params)
        assert np.isfinite(float(updates["x"]))
        # no-op when the optimizer carries no EmaState
        plain = optax.sgd(0.1).init(params)
        rebuilt_plain = replace_ema_params(plain, snapshot)
        assert (jax.tree_util.tree_structure(plain)
                == jax.tree_util.tree_structure(rebuilt_plain))

    def test_ema_transform_rejects_bad_decay(self):
        from ics_tpu.train.finetune import ema_params_transform

        for bad in (0.0, 1.0, -0.5, 1.5):
            with pytest.raises(ValueError):
                ema_params_transform(bad)

    def test_finetuner_ema_end_to_end(self):
        """ema_decay: shadow tree exists in opt_state, differs from both the
        init and the final raw params, and stays finite."""
        from ics_tpu.models.resnet import resnet_tiny
        from ics_tpu.train.finetune import find_ema_params

        model = resnet_tiny(num_classes=2)
        variables = model.init(jax.random.PRNGKey(0))
        init_head = np.array(variables["params"]["head"]["w"])
        tuner = FineTuner(
            model, optimizer=make_optimizer(lr=0.05),
            image_size=32, resize_short=32, compute_dtype=jnp.float32,
            ema_decay=0.5,
        )
        rng = np.random.default_rng(0)
        canvas = rng.integers(0, 256, (4, 64, 64, 3), np.uint8)
        sizes = np.full((4, 2), 48, np.int32)
        labels = np.asarray([0, 1, 0, 1], np.int32)
        out_vars, opt_state, _ = tuner.run(
            variables, iter([(canvas, sizes, labels)] * 3)
        )
        shadow = find_ema_params(opt_state)
        assert shadow is not None
        ema_head = np.asarray(shadow["head"]["w"])
        raw_head = np.asarray(out_vars["params"]["head"]["w"])
        assert not np.allclose(ema_head, init_head)
        assert not np.allclose(ema_head, raw_head)
        # the shadow trails the raw weights toward the init (decay mixing)
        assert np.all(np.isfinite(ema_head))

    def test_finetuner_ema_on_mesh(self):
        """Sharded DP path: the EmaState rides the replicated opt_state."""
        from ics_tpu.models.resnet import resnet_tiny
        from ics_tpu.parallel.mesh import make_mesh
        from ics_tpu.train.finetune import find_ema_params

        model = resnet_tiny(num_classes=2)
        variables = model.init(jax.random.PRNGKey(0))
        mesh = make_mesh((2,), ("data",), devices=jax.devices()[:2])
        tuner = FineTuner(
            model, image_size=32, resize_short=32,
            compute_dtype=jnp.float32, mesh=mesh, ema_decay=0.9,
        )
        rng = np.random.default_rng(1)
        canvas = rng.integers(0, 256, (4, 64, 64, 3), np.uint8)
        sizes = np.full((4, 2), 48, np.int32)
        labels = np.asarray([0, 1, 0, 1], np.int32)
        _, opt_state, history = tuner.run(
            variables, iter([(canvas, sizes, labels)] * 2)
        )
        shadow = find_ema_params(jax.tree_util.tree_map(np.asarray, opt_state))
        assert shadow is not None
        assert all(np.isfinite(h["loss"]) for h in history)


class TestGradAccum:
    def test_accum_matches_full_batch(self):
        """BN-free quadratic model: applying once with the mean of 2
        micro-batch gradients must equal one plain step on the full batch
        (optax.MultiSteps averages the accumulator)."""
        import optax

        from ics_tpu.train.finetune import make_grad_accum

        w0 = jnp.asarray([1.0, -2.0])
        x1 = jnp.asarray([[1.0, 0.5], [0.2, -1.0]])
        x2 = jnp.asarray([[-0.3, 2.0], [1.5, 0.1]])
        y1 = jnp.asarray([0.7, -0.4])
        y2 = jnp.asarray([1.2, 0.0])

        def loss(w, x, y):
            return jnp.mean((x @ w - y) ** 2)

        # accumulated: two micro-steps, apply on the second
        opt = make_grad_accum(optax.sgd(0.1), 2)
        w, state = w0, opt.init(w0)
        for x, y in ((x1, y1), (x2, y2)):
            g = jax.grad(loss)(w, x, y)
            updates, state = opt.update(g, state, w)
            w = optax.apply_updates(w, updates)
        # reference: one step on the concatenated batch (same sample count
        # per micro-batch => full-batch grad == mean of micro-grads)
        ref_opt = optax.sgd(0.1)
        g_full = jax.grad(loss)(
            w0, jnp.concatenate([x1, x2]), jnp.concatenate([y1, y2])
        )
        ref_updates, _ = ref_opt.update(g_full, ref_opt.init(w0), w0)
        w_ref = optax.apply_updates(w0, ref_updates)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                                   rtol=1e-6)

    def test_params_hold_still_on_micro_steps(self):
        import optax

        from ics_tpu.train.finetune import make_grad_accum

        opt = make_grad_accum(optax.sgd(0.1), 3)
        w = jnp.asarray([1.0, 2.0])
        state = opt.init(w)
        for i in range(2):  # first 2 of 3 micro-steps: zero updates
            updates, state = opt.update(jnp.ones_like(w), state, w)
            assert float(jnp.max(jnp.abs(updates))) == 0.0, i

    def test_invalid_and_identity_factors(self):
        import optax

        from ics_tpu.train.finetune import make_grad_accum

        with pytest.raises(ValueError, match="acumular_gradientes"):
            make_grad_accum(optax.sgd(0.1), 0)
        base = optax.sgd(0.1)
        assert make_grad_accum(base, 1) is base

    def test_finetuner_accum_with_ema(self):
        """grad_accum + EMA end-to-end: the accumulator wraps the chain,
        find_ema_params still locates the shadow inside MultiStepsState,
        and params only move on apply steps."""
        from ics_tpu.models.resnet import resnet_tiny
        from ics_tpu.train.finetune import find_ema_params

        model = resnet_tiny(num_classes=2)
        variables = model.init(jax.random.PRNGKey(0))
        tuner = FineTuner(
            model, optimizer=make_optimizer(lr=0.05),
            image_size=32, resize_short=32, compute_dtype=jnp.float32,
            ema_decay=0.5, grad_accum=2,
        )
        rng = np.random.default_rng(0)
        canvas = rng.integers(0, 256, (4, 64, 64, 3), np.uint8)
        sizes = np.full((4, 2), 48, np.int32)
        labels = np.asarray([0, 1, 0, 1], np.int32)
        before = np.array(variables["params"]["head"]["w"])
        # run() donates its input tree — each run needs its own copy
        vars_a = jax.tree_util.tree_map(jnp.array, variables)
        vars_b = jax.tree_util.tree_map(jnp.array, variables)
        # 1 micro-step: no apply yet -> params unchanged
        out_vars, opt_state, _ = tuner.run(
            vars_a, iter([(canvas, sizes, labels)] * 1)
        )
        np.testing.assert_array_equal(
            before, np.asarray(out_vars["params"]["head"]["w"])
        )
        # 2 micro-steps: one apply -> params move, EMA shadow reachable
        out_vars, opt_state, history = tuner.run(
            vars_b, iter([(canvas, sizes, labels)] * 2)
        )
        assert not np.allclose(
            before, np.asarray(out_vars["params"]["head"]["w"])
        )
        shadow = find_ema_params(opt_state)
        assert shadow is not None
        assert all(np.isfinite(h["loss"]) for h in history)


class TestEarlyStopping:
    """FineTuner.run periodic-eval hook: best snapshot + patience."""

    def _tuner_and_batch(self):
        from ics_tpu.models.resnet import resnet_tiny

        model = resnet_tiny(num_classes=2)
        variables = model.init(jax.random.PRNGKey(0))
        tuner = FineTuner(
            model, optimizer=make_optimizer(lr=0.05),
            image_size=32, resize_short=32, compute_dtype=jnp.float32,
        )
        rng = np.random.default_rng(0)
        canvas = rng.integers(0, 256, (4, 64, 64, 3), np.uint8)
        sizes = np.full((4, 2), 48, np.int32)
        labels = np.asarray([0, 1, 0, 1], np.int32)
        return tuner, variables, (canvas, sizes, labels)

    def test_patience_stops_and_keeps_best(self):
        """Decreasing metric sequence: stop after `patience` consecutive
        non-improving evals; self.best holds the FIRST (peak) snapshot."""
        tuner, variables, batch = self._tuner_and_batch()
        metrics = iter([0.9, 0.5, 0.4, 0.3, 0.2, 0.1])
        seen_steps = []

        def eval_fn(vs, opt_state, step):
            seen_steps.append(step)
            return next(metrics), vs

        _, _, history = tuner.run(
            variables, iter([batch] * 10),
            eval_every=1, eval_fn=eval_fn, patience=2,
        )
        # evals at steps 1 (best), 2, 3 -> 2 consecutive misses -> stop
        assert seen_steps == [1, 2, 3]
        assert len(history) == 3
        assert tuner.stopped_early is True
        assert tuner.best["metric"] == 0.9 and tuner.best["step"] == 1
        # snapshot is a HOST copy of the eval variables
        leaf = jax.tree_util.tree_leaves(tuner.best["variables"])[0]
        assert isinstance(leaf, np.ndarray)
        assert history[0]["eval"] == 0.9 and history[2]["eval"] == 0.4

    def test_improving_metric_never_stops(self):
        tuner, variables, batch = self._tuner_and_batch()
        calls = iter([0.1, 0.2, 0.3, 0.4, 0.5])

        def eval_fn(vs, opt_state, step):
            return next(calls), vs

        _, _, history = tuner.run(
            variables, iter([batch] * 5),
            eval_every=1, eval_fn=eval_fn, patience=2,
        )
        assert len(history) == 5
        assert tuner.stopped_early is False
        assert tuner.best["metric"] == 0.5 and tuner.best["step"] == 5

    def test_none_metric_skipped(self):
        """eval_fn may return None (empty eval split batch): no best update,
        no patience consumption."""
        tuner, variables, batch = self._tuner_and_batch()

        def eval_fn(vs, opt_state, step):
            return None, vs

        _, _, history = tuner.run(
            variables, iter([batch] * 3),
            eval_every=1, eval_fn=eval_fn, patience=1,
        )
        assert len(history) == 3
        assert tuner.stopped_early is False and tuner.best is None

    def test_eval_every_spacing(self):
        tuner, variables, batch = self._tuner_and_batch()
        seen = []

        def eval_fn(vs, opt_state, step):
            seen.append(step)
            return 1.0, vs

        tuner.run(variables, iter([batch] * 6),
                  eval_every=3, eval_fn=eval_fn, patience=0)
        assert seen == [3, 6]
        assert tuner.stopped_early is False


class TestPerClassMetrics:
    def test_confusion_matrix_and_per_class(self):
        """Hand-computed 3-class case: cm rows=true, cols=pred."""
        from ics_tpu.train.finetune import per_class_metrics

        # logits whose argmax is the 'pred' column below
        labels = np.asarray([0, 0, 1, 1, 2, 2])
        preds = [0, 1, 1, 1, 0, 2]
        logits = np.full((6, 3), -10.0)
        for i, p in enumerate(preds):
            logits[i, p] = 10.0
        m = per_class_metrics(logits, labels, 3)
        assert m["matriz_confusao"] == [[1, 1, 0], [0, 2, 0], [1, 0, 1]]
        c0, c1, c2 = m["por_classe"]
        # class 0: tp=1, predicted=2, support=2
        assert c0["precisao"] == 0.5 and c0["revocacao"] == 0.5
        assert c0["suporte"] == 2
        # class 1: tp=2, predicted=3, support=2
        assert c1["precisao"] == pytest.approx(2 / 3)
        assert c1["revocacao"] == 1.0
        # class 2: tp=1, predicted=1, support=2
        assert c2["precisao"] == 1.0 and c2["revocacao"] == 0.5
        f1s = [
            2 * c["precisao"] * c["revocacao"]
            / (c["precisao"] + c["revocacao"])
            for c in (c0, c1, c2)
        ]
        assert m["f1_macro"] == pytest.approx(sum(f1s) / 3)

    def test_unseen_class_excluded_from_macro(self):
        """A class with 0 eval support (tiny split) must not drag f1_macro
        to 0 — it is excluded, not counted as failure."""
        from ics_tpu.train.finetune import per_class_metrics

        labels = np.asarray([0, 0])
        logits = np.asarray([[5.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
        m = per_class_metrics(logits, labels, 3)
        assert m["por_classe"][1]["suporte"] == 0
        assert m["por_classe"][2]["suporte"] == 0
        assert m["f1_macro"] == 1.0  # only class 0 seen, perfectly

    def test_multilabel_per_class(self):
        from ics_tpu.train.finetune import multilabel_per_class_metrics

        probs = np.asarray([[0.9, 0.1], [0.8, 0.6], [0.2, 0.7]])
        targets = np.asarray([[1, 0], [1, 1], [0, 0]])
        rows = multilabel_per_class_metrics(probs, targets, 0.5)
        # class 0: pred {0,1}, true {0,1} -> perfect, support 2
        assert rows[0]["precisao"] == 1.0 and rows[0]["revocacao"] == 1.0
        assert rows[0]["suporte"] == 2
        # class 1: pred {1,2}, true {1} -> p=0.5, r=1.0, support 1
        assert rows[1]["precisao"] == 0.5 and rows[1]["revocacao"] == 1.0
        assert rows[1]["suporte"] == 1


class TestLLRD:
    def test_multiplier_depths_vit(self):
        """ViT: stem subtrees decay^(L+1), blocks[i] decay^(L-i), head 1."""
        from ics_tpu.models.vit import ViT
        from ics_tpu.train.finetune import llrd_multipliers

        model = ViT(image_size=32, patch_size=8, dim=16, depth=3,
                    num_heads=2, num_classes=2)
        params = model.init(jax.random.PRNGKey(0))["params"]
        d = 0.5
        m = llrd_multipliers(params, d)
        L = len(params["blocks"])
        # stem-family keys at depth 0
        assert jax.tree_util.tree_leaves(m["patch_embed"])[0] == d ** (L + 1)
        assert jax.tree_util.tree_leaves(m["cls_token"])[0] == d ** (L + 1)
        # block i at depth i+1
        for i in range(L):
            leaf = jax.tree_util.tree_leaves(m["blocks"][i])[0]
            assert leaf == pytest.approx(d ** (L - i)), i
        # head + final ln at full LR
        assert jax.tree_util.tree_leaves(m["head"])[0] == 1.0
        assert jax.tree_util.tree_leaves(m["ln"])[0] == 1.0

    def test_multiplier_depths_resnet_stages(self):
        """ResNet: stages-of-lists get GLOBAL block ordinals."""
        from ics_tpu.models.resnet import resnet_tiny
        from ics_tpu.train.finetune import llrd_multipliers

        model = resnet_tiny(num_classes=2)
        params = model.init(jax.random.PRNGKey(0))["params"]
        d = 0.5
        m = llrd_multipliers(params, d)
        L = sum(len(st) for st in params["stages"])
        assert jax.tree_util.tree_leaves(m["stem"])[0] == d ** (L + 1)
        # first block of first stage is depth 1; last block depth L
        assert jax.tree_util.tree_leaves(m["stages"][0][0])[0] \
            == pytest.approx(d ** L)
        assert jax.tree_util.tree_leaves(m["stages"][-1][-1])[0] \
            == pytest.approx(d ** 1)
        assert jax.tree_util.tree_leaves(m["head"])[0] == 1.0
        # monotone: depth strictly increases along the global ordinal
        ords = [jax.tree_util.tree_leaves(m["stages"][s][b])[0]
                for s in range(len(params["stages"]))
                for b in range(len(params["stages"][s]))]
        assert ords == sorted(ords)

    def test_boundary_keys_pinned_between_stages(self):
        from ics_tpu.models.convnext import convnext_tiny
        from ics_tpu.train.finetune import llrd_multipliers

        params = convnext_tiny(num_classes=2).init(
            jax.random.PRNGKey(0)
        )["params"]
        d = 0.8
        m = llrd_multipliers(params, d)
        offs = [0]
        for st in params["stages"]:
            offs.append(offs[-1] + len(st))
        L = offs[-1]
        for s in range(len(params["down"])):
            got = jax.tree_util.tree_leaves(m["down"][s])[0]
            # down[s] precedes stage s+1: pinned just before its first block
            assert got == pytest.approx(d ** (L + 1 - offs[s + 1])), s

    def test_rejects_bad_decay(self):
        from ics_tpu.train.finetune import llrd_multipliers

        with pytest.raises(ValueError, match="llrd"):
            llrd_multipliers({"head": {"w": np.zeros(2)}}, 0.0)
        with pytest.raises(ValueError, match="llrd"):
            llrd_multipliers({"head": {"w": np.zeros(2)}}, 1.5)

    def test_adamw_head_moves_more_than_stem(self):
        """The placement test: with AdamW (scale-invariant to gradient
        pre-scaling) the head update must be ~1/llrd^(L+1) times the stem
        update — proving the multiplier lands POST-Adam."""
        from ics_tpu.models.resnet import resnet_tiny
        from ics_tpu.train.finetune import llrd_transform

        import optax

        model = resnet_tiny(num_classes=2)
        variables = model.init(jax.random.PRNGKey(0))
        params = variables["params"]
        opt = optax.chain(optax.adamw(0.01), llrd_transform(0.5))
        state = opt.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = opt.update(grads, state, params)
        # adam first-step update is ~ -lr * sign-ish (all grads equal) —
        # so the RATIO isolates the multiplier exactly
        head_u = float(jnp.abs(
            jax.tree_util.tree_leaves(updates["head"])[0]
        ).mean())
        stem_u = float(jnp.abs(
            jax.tree_util.tree_leaves(updates["stem"])[0]
        ).mean())
        L = sum(len(st) for st in params["stages"])
        assert head_u / stem_u == pytest.approx(2.0 ** (L + 1), rel=1e-3)

    def test_finetuner_llrd_end_to_end(self):
        """Head moves, stem barely moves, loss finite; opt_state carries
        the multiplier tree through checkpoint-compatible machinery."""
        from ics_tpu.models.resnet import resnet_tiny

        model = resnet_tiny(num_classes=2)
        variables = model.init(jax.random.PRNGKey(0))
        stem0 = np.asarray(
            jax.tree_util.tree_leaves(variables["params"]["stem"])[0]
        ).copy()
        head0 = np.asarray(variables["params"]["head"]["w"]).copy()
        tuner = FineTuner(
            model, optimizer=make_optimizer(lr=0.1),
            image_size=32, resize_short=32, compute_dtype=jnp.float32,
            llrd=0.3,
        )
        rng = np.random.default_rng(0)
        canvas = rng.integers(0, 256, (4, 64, 64, 3), np.uint8)
        sizes = np.full((4, 2), 48, np.int32)
        labels = np.asarray([0, 1, 0, 1], np.int32)
        out, _, history = tuner.run(
            variables, iter([(canvas, sizes, labels)] * 3)
        )
        head_delta = float(np.abs(
            np.asarray(out["params"]["head"]["w"]) - head0
        ).max())
        stem_delta = float(np.abs(np.asarray(
            jax.tree_util.tree_leaves(out["params"]["stem"])[0]
        ) - stem0).max())
        assert head_delta > 0.0
        assert stem_delta < head_delta * 0.1  # decay^(L+1) << 1
        assert all(np.isfinite(h["loss"]) for h in history)


class TestFixedClassMap:
    def test_fixed_map_falls_back_to_known_label(self, labeled_db):
        """Single-label eval with a FIXED class_map (model re-evaluation):
        an image whose min-text label is UNKNOWN to the model must fall
        back to its other, model-known label — not be dropped (the GROUP-BY
        collapse must run over model-known options only)."""
        from ics_tpu.core import timezone as tz
        from ics_tpu.db.models import Classificacao, Opcao, UsuarioConvencional

        db, amb_id, blobs = labeled_db
        with db.session() as s:
            ops = {o.texto: o for o in s.query(Opcao).filter(
                Opcao.id_amb == amb_id
            ).all()}
            # texts: 'cão' < 'gato' — 'cão' wins any min-text collapse
            op_cao, op_gato = ops["cão"], ops["gato"]
            con = s.query(UsuarioConvencional).all()[0]
            # image 0 is labeled 'gato' (even i); ALSO label it 'cão'
            gato_rows = s.fetchall(
                "SELECT id_img FROM classificacoes WHERE id_opc = ?",
                [str(op_gato.id_opc)],
            )
            target = gato_rows[0]["id_img"]
            s.add(Classificacao(
                id_con=con.id_con, id_img=target, id_opc=op_cao.id_opc,
                data_criado=tz.utcnow(), ativo=True,
            ))
            s.commit()
            id_gato = str(op_gato.id_opc)
            id_cao = str(op_cao.id_opc)

        # model that only knows 'gato' (trained before 'cão' existed)
        fixed = {id_gato: 0}
        examples, cm = labeled_examples(db, amb_id, class_map=fixed)
        assert cm == {id_gato: 0}
        by_hash = {e["content_hash"]: e["label"] for e in examples}
        # the double-labeled image evaluates with its model-known label
        assert by_hash[target] == 0
        # only 'gato'-labeled images are evaluable (4 of 8)
        assert len(examples) == 4

        # sanity: the full map still collapses min-text first ('cão' wins
        # the double-labeled image)
        examples_full, cm_full = labeled_examples(db, amb_id)
        full_by_hash = {e["content_hash"]: e["label"] for e in examples_full}
        assert full_by_hash[target] == cm_full[id_cao]


class TestBytesProvider:
    def test_concurrent_fetch_is_serialized(self):
        """nextcloud_bytes_provider is shared by the training thread AND
        route executors (/inferencia/indexar, bulk sugerir): two OS
        threads entering its private event loop concurrently must be
        serialized, not corrupt the loop (self-review r3). Without the
        lock this raises 'This event loop is already running'."""
        import asyncio
        import threading

        from ics_tpu.train.job import nextcloud_bytes_provider

        class FakeClient:
            async def get_file(self, caminho):
                await asyncio.sleep(0.02)  # force temporal overlap
                return caminho.encode()

        fetch = nextcloud_bytes_provider(FakeClient)
        results: dict[int, bytes] = {}
        errors: list[BaseException] = []

        def worker(i: int):
            try:
                for j in range(5):
                    results[(i, j)] = fetch("h", f"/f/{i}-{j}.jpg")
            except BaseException as exc:  # noqa: BLE001 - recorded for assert
                errors.append(exc)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        assert len(results) == 15
        assert results[(2, 4)] == b"/f/2-4.jpg"
