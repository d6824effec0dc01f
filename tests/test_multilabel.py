"""Multi-label training + serving for ``multipla_escolha`` ambientes.

The reference lets specialists attach SEVERAL options to one image when the
ambiente has ``multipla_escolha=True`` (/root/reference/app/api/routes/
classificacoes.py single-choice gate only when False); the TPU tier mirrors
that at train time (multi-hot targets + per-class sigmoid BCE,
train/finetune.py) and at serving time (sigmoid scores + >=0.5 suggestion
sets, runtime/engine.py multi_label).
"""

import asyncio

import httpx
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_tpu.core import timezone as tz
from ics_tpu.core.security import hash_password, sha256_hex
from ics_tpu.db.engine import Database
from ics_tpu.db.models import (
    Ambiente,
    AmbienteConjuntoImagens,
    Classificacao,
    ConjuntoImagens,
    Imagem,
    Opcao,
    UsuarioAmbiente,
    UsuarioConvencional,
    Usuario,
)
from ics_tpu.train.data import batch_iterator, labeled_examples
from tests.fake_nextcloud import make_jpeg
from tests.test_train_serve_e2e import ADMIN, _login


class TestLossMath:
    def test_sigmoid_bce_matches_manual(self):
        from ics_tpu.train.finetune import sigmoid_bce_loss

        logits = jnp.asarray([[2.0, -1.0, 0.5], [0.0, 3.0, -2.0]])
        targets = jnp.asarray([[1.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
        p = jax.nn.sigmoid(logits)
        manual = -(targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p))
        expected = float(jnp.mean(jnp.sum(manual, axis=-1)))
        got = float(sigmoid_bce_loss(logits, targets))
        assert abs(got - expected) < 1e-5

    def test_exact_match_threshold(self):
        from ics_tpu.train.finetune import multilabel_exact_match

        logits = jnp.asarray([
            [3.0, -3.0],   # pred {0} == target {0}
            [3.0, 3.0],    # pred {0,1} != target {0}
            [-1.0, 2.0],   # pred {1} == target {1}
            [-1.0, -1.0],  # pred {} != target {0,1}
        ])
        targets = jnp.asarray([
            [1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0],
        ])
        assert float(multilabel_exact_match(logits, targets)) == 0.5

    def test_smooth_multilabel_moves_toward_half(self):
        from ics_tpu.ops.augment import smooth_multilabel

        t = jnp.asarray([[1.0, 0.0]])
        out = smooth_multilabel(t, 0.2)
        np.testing.assert_allclose(np.asarray(out), [[0.9, 0.1]], atol=1e-6)
        # no smoothing -> unchanged
        np.testing.assert_array_equal(
            np.asarray(smooth_multilabel(t, 0.0)), np.asarray(t)
        )


class TestThresholdCalibration:
    def test_sweep_beats_half_on_imbalanced_scores(self):
        """Scores clustered just under 0.5 for true positives: the sweep
        must lower the threshold; micro-F1 at the calibrated threshold
        must beat the fixed-0.5 metrics."""
        from ics_tpu.train.finetune import (
            calibrate_multilabel_threshold,
            multilabel_metrics,
        )

        rng = np.random.default_rng(0)
        n, c = 40, 3
        targets = (rng.random((n, c)) < 0.4).astype(np.float32)
        targets[0, 0] = 1.0  # at least one positive overall
        # positives score 0.30-0.45, negatives 0.05-0.20: perfectly
        # separable, but every positive is below 0.5
        probs = np.where(
            targets >= 0.5,
            rng.uniform(0.30, 0.45, (n, c)),
            rng.uniform(0.05, 0.20, (n, c)),
        ).astype(np.float32)
        t, cal = calibrate_multilabel_threshold(probs, targets)
        base = multilabel_metrics(probs, targets, 0.5)
        assert t < 0.5
        assert cal["f1_micro"] == 1.0
        assert cal["f1_micro"] > base["f1_micro"]
        assert cal == multilabel_metrics(probs, targets, t)

    def test_tiny_split_stays_at_half(self):
        """Below the positive-label floor calibration is memorization —
        the threshold must stay 0.5 even when a sweep would 'win'."""
        from ics_tpu.train.finetune import calibrate_multilabel_threshold

        probs = np.asarray([[0.3, 0.1], [0.35, 0.05]], np.float32)
        targets = np.asarray([[1.0, 0.0], [1.0, 0.0]], np.float32)
        t, _ = calibrate_multilabel_threshold(probs, targets)
        assert t == 0.5

    def test_tie_breaks_toward_half(self):
        """Separable scores straddling 0.5: several thresholds give
        F1=1.0; the one closest to 0.5 must win for serving stability."""
        from ics_tpu.train.finetune import calibrate_multilabel_threshold

        rng = np.random.default_rng(1)
        n, c = 30, 2
        targets = (rng.random((n, c)) < 0.5).astype(np.float32)
        probs = np.where(targets >= 0.5, 0.9, 0.1).astype(np.float32)
        t, cal = calibrate_multilabel_threshold(probs, targets)
        assert t == 0.5
        assert cal["f1_micro"] == 1.0


class _ConstLogits:
    """Stub model: ignores pixels, returns a fixed logits row per batch
    index — lets evaluate_multilabel's tp/fp/fn aggregation be checked
    exactly."""

    def __init__(self, logits):
        self._logits = jnp.asarray(logits, jnp.float32)

    def apply(self, variables, images, training):
        assert training is False
        return self._logits[: images.shape[0]], None


class TestEvaluateMultilabel:
    def test_micro_f1_and_exact_match_counts(self):
        from ics_tpu.train.finetune import evaluate_multilabel

        # predictions (>=0): row0 {0}, row1 {0,1}, row2 {}
        model = _ConstLogits([[1.0, -1.0], [1.0, 1.0], [-1.0, -1.0]])
        targets = np.asarray(
            [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]], np.float32
        )
        canvas = np.zeros((3, 32, 32, 3), np.uint8)
        sizes = np.full((3, 2), 32, np.int32)
        batches = [(canvas, sizes, targets, 3)]
        metrics, total = evaluate_multilabel(
            model, {}, iter(batches), image_size=16, resize_short=16,
            compute_dtype=jnp.float32,
        )
        # tp=2 (r0 c0, r1 c0), fp=1 (r1 c1), fn=1 (r2 c1)
        assert total == 3
        assert abs(metrics["precision"] - 2 / 3) < 1e-6
        assert abs(metrics["recall"] - 2 / 3) < 1e-6
        assert abs(metrics["f1_micro"] - 2 / 3) < 1e-6
        assert abs(metrics["exact_match"] - 1 / 3) < 1e-6

    def test_padded_rows_masked(self):
        from ics_tpu.train.finetune import evaluate_multilabel

        model = _ConstLogits([[1.0, -1.0], [9.0, 9.0]])
        targets = np.asarray([[1.0, 0.0], [1.0, 1.0]], np.float32)
        canvas = np.zeros((2, 32, 32, 3), np.uint8)
        sizes = np.full((2, 2), 32, np.int32)
        # n_real=1: the (would-be exact) padded row must not count
        metrics, total = evaluate_multilabel(
            model, {}, iter([(canvas, sizes, targets, 1)]),
            image_size=16, resize_short=16, compute_dtype=jnp.float32,
        )
        assert total == 1
        assert metrics["exact_match"] == 1.0
        assert metrics["f1_micro"] == 1.0


def _seed_multilabel(db: Database, a) -> dict[str, bytes]:
    """multipla_escolha ambiente: 8 images, every even one carries BOTH
    options, odd ones only the second."""
    now = tz.utcnow()
    blobs: dict[str, bytes] = {}
    with db.session() as s:
        esp = Usuario(
            nome_completo="Especialista Multi", email="multi@x.com",
            senha_hash=hash_password("SenhaBoa1"), data_criado=now, id_tipo=1,
        )
        s.add(esp)
        s.flush()
        con = UsuarioConvencional(cpf="3" * 11, id_usu=esp.id_usu)
        s.add(con)
        s.flush()
        adm_row = s.fetchone(
            "SELECT id_adm FROM usuarios_administradores LIMIT 1"
        )
        cnj = ConjuntoImagens(
            nome_conj="ml", caminho_conj="/ml", file_id="ml1",
            imagens_sincronizadas=True, data_proc=now, data_sinc=now,
        )
        s.add(cnj)
        s.flush()
        amb = Ambiente(
            titulo_amb="Treino Multi", descricao_questionario="d",
            data_criado=now, id_adm=adm_row["id_adm"],
            multipla_escolha=True,
        )
        s.add(amb)
        s.flush()
        s.add(AmbienteConjuntoImagens(
            id_amb=amb.id_amb, id_cnj=cnj.id_cnj, data_associado=now,
        ))
        s.add(UsuarioAmbiente(
            id_con=con.id_con, id_amb=amb.id_amb, data_associado=now,
        ))
        op1 = Opcao(texto="arranhado", id_amb=amb.id_amb)
        op2 = Opcao(texto="borrado", id_amb=amb.id_amb)
        s.add_all([op1, op2])
        s.flush()
        for i in range(8):
            data = make_jpeg(100 + i, size=(60, 60))
            h = sha256_hex(data)
            blobs[h] = data
            s.add(Imagem(
                content_hash=h, nome_img=f"m{i}.jpg",
                caminho_img=f"ml/m{i}.jpg",
                data_proc=now, data_sinc=now, id_cnj=cnj.id_cnj,
            ))
            s.add(Classificacao(
                id_con=con.id_con, id_img=h, id_opc=op2.id_opc,
                data_criado=now, ativo=True,
            ))
            if i % 2 == 0:
                s.add(Classificacao(
                    id_con=con.id_con, id_img=h, id_opc=op1.id_opc,
                    data_criado=now, ativo=True,
                ))
        s.commit()
        a.state.id_amb = str(amb.id_amb)
        a.state.opcoes = [str(op1.id_opc), str(op2.id_opc)]
    return blobs


@pytest.fixture()
async def ml_app(tmp_path):
    from ics_tpu.core.config import reload_settings
    from ics_tpu.main import create_app

    reload_settings(
        TPU_ENABLE_INFERENCE="true",
        TPU_MESH_SHAPE="1",
        TPU_DEFAULT_MODEL="resnet_tiny",
        TPU_NUM_CLASSES="16",
        TPU_PRECISION="fp32",
        TPU_CANVAS="64",
        TPU_BATCH_BUCKETS="4",
        TPU_BATCH_DEADLINE_US="20000",
        TPU_WARMUP_ON_STARTUP="false",
        TPU_DEVICE_DECODE="false",
        TPU_WEIGHTS_DIR=str(tmp_path / "weights"),
    )
    try:
        db = Database(f"sqlite:///{tmp_path}/ml.db")
        a = create_app(db=db)
        await a.startup()
        blobs = _seed_multilabel(db, a)
        assert a.state.trainer is not None
        a.state.trainer.fetch_bytes = lambda h, path: blobs[h]
        a.state.blobs = blobs
        yield a
        await a.shutdown()
    finally:
        reload_settings()


@pytest.mark.anyio
async def test_labeled_examples_multilabel(ml_app):
    db = ml_app.state.db
    examples, class_map = labeled_examples(
        db, ml_app.state.id_amb, multi_label=True
    )
    assert len(examples) == 8
    assert len(class_map) == 2
    two = [e for e in examples if len(e["labels"]) == 2]
    one = [e for e in examples if len(e["labels"]) == 1]
    assert len(two) == 4 and len(one) == 4
    for e in two:
        assert e["labels"] == [0, 1]
    # single-label collapse still works on the same data
    single, _ = labeled_examples(db, ml_app.state.id_amb)
    assert len(single) == 8
    assert all("label" in e for e in single)


@pytest.mark.anyio
async def test_batch_iterator_multihot(ml_app):
    db = ml_app.state.db
    blobs = ml_app.state.blobs
    examples, class_map = labeled_examples(
        db, ml_app.state.id_amb, multi_label=True
    )
    batches = list(batch_iterator(
        examples, lambda h, p: blobs[h], batch_size=4, canvas=64,
        shuffle=False, epochs=1, num_classes=len(class_map),
    ))
    assert len(batches) == 2
    canvas, sizes, hot = batches[0]
    assert hot.shape == (4, 2) and hot.dtype == np.float32
    assert set(np.unique(hot)) <= {0.0, 1.0}
    # every row has at least one positive class
    assert (hot.sum(axis=1) >= 1).all()
    # multi-label examples without num_classes must fail loudly
    with pytest.raises(ValueError):
        next(iter(batch_iterator(
            examples, lambda h, p: blobs[h], batch_size=4, canvas=64,
        )))


@pytest.mark.anyio
async def test_job_trains_and_serves_multilabel(ml_app):
    transport = httpx.ASGITransport(app=ml_app)
    async with httpx.AsyncClient(transport=transport, base_url="http://t") as c:
        admin = await _login(c, **ADMIN)
        id_amb = ml_app.state.id_amb

        # avaliar_cada=1 also exercises the MULTI-LABEL periodic-eval
        # branch (exact-match at 0.5 on the held-out split) and the
        # best-snapshot registration through the multi-label path
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "max_steps": 3, "batch_size": 4,
                  "epochs": 50, "canvas": 64, "avaliar_cada": 1},
            headers=admin,
        )
        assert r.status_code == 202, r.text
        id_job = r.json()["id_job"]

        for _ in range(600):
            r = await c.get(f"/treinamento/jobs/{id_job}", headers=admin)
            status = r.json()
            if status["status"] in ("concluido", "falhou"):
                break
            await asyncio.sleep(0.25)
        assert status["status"] == "concluido", status
        assert status["eval_accuracy"] is not None
        assert all("eval" in h for h in status["historico"])
        assert status["melhor_passo"] >= 1
        assert status["parou_cedo"] is False  # no paciencia -> no stop

        # registry row carries the multi-label marker + metrics
        r = await c.get("/treinamento/modelos", headers=admin)
        row = next(
            m for m in r.json()["modelos"] if m["id_amb"] == id_amb
        )
        assert row["metricas"]["multi_rotulo"] is True
        ml = row["metricas"]["eval_multilabel"]
        assert ml is None or {"f1_micro", "exact_match"} <= set(ml)
        # calibrated serving threshold travels in metricas (None only
        # when the job had no eval split)
        limiar = row["metricas"].get("limiar")
        assert limiar is None or 0.05 <= limiar <= 0.95

        # serving: sigmoid scores + >=0.5 suggestion set
        esp = await _login(c, username="multi@x.com", password="SenhaBoa1")
        data = next(iter(ml_app.state.blobs.values()))
        r = await c.post(
            f"/classificacoes/ambiente/{id_amb}/classificar-tpu",
            files={"file": ("m.jpg", data, "image/jpeg")},
            headers=esp,
        )
        assert r.status_code == 200, r.text
        body = r.json()
        assert body["multi_rotulo"] is True
        assert isinstance(body["opcoes_sugeridas"], list)
        assert 0.05 <= body["limiar"] <= 0.95
        for o in body["opcoes_sugeridas"]:
            assert o["score"] >= body["limiar"]
        # sigmoid scores are independent per class — with 2 classes the
        # top-2 need not sum to 1 (softmax would force exactly 1)
        scores = [o["score"] for o in body["opcoes"]]
        assert len(scores) == 2
        assert not np.isclose(sum(scores), 1.0, atol=1e-3) or all(
            0.0 <= s <= 1.0 for s in scores
        )


@pytest.mark.anyio
async def test_paging_suggestion_carries_calibrated_set(ml_app):
    """sugestoes_por_imagens: multi-label model rows render the
    above-limiar suggested set next to the top-1 fields."""
    from ics_tpu.crud import modelo_crud

    db = ml_app.state.db
    id_amb = ml_app.state.id_amb
    op1, op2 = ml_app.state.opcoes
    some_hash = next(iter(ml_app.state.blobs))
    with db.session() as s:
        row = modelo_crud.registrar_modelo(
            s, id_amb=id_amb, nome_modelo="resnet_tiny", num_classes=2,
            class_map={op1: 0, op2: 1}, dir_checkpoint="/tmp/x", passo=1,
            metricas={"multi_rotulo": True, "limiar": 0.35},
            ativar=True,
        )
        classes = [
            {"id_opc": op1, "score": 0.9},
            {"id_opc": op2, "score": 0.4},
        ]
        modelo_crud.registrar_sugestao(
            s, some_hash, modelo="resnet_tiny", classes=classes,
            score=0.9, id_amb=id_amb, id_mod=row.id_mod, id_opc=op1,
            versao=row.versao,
        )
        s.commit()
    with db.session() as s:
        out = modelo_crud.sugestoes_por_imagens(
            s, [some_hash], id_amb=id_amb
        )
    sug = out[some_hash]
    assert sug["multi_rotulo"] is True
    assert sug["limiar"] == 0.35
    # 0.9 and 0.4 both clear the calibrated 0.35 threshold
    assert [c["id_opc"] for c in sug["sugeridas"]] == [op1, op2]
    # top-1 contract unchanged
    assert sug["id_opc"] == op1 and sug["score"] == 0.9


class TestFineTunerMultilabel:
    def test_train_step_runs_and_learns_shape(self):
        from ics_tpu.models.resnet import resnet_tiny
        from ics_tpu.train.finetune import FineTuner

        model = resnet_tiny(num_classes=3)
        variables = model.init(jax.random.PRNGKey(0))
        tuner = FineTuner(model, image_size=32, resize_short=32,
                          compute_dtype=jnp.float32, multi_label=True)
        rng = np.random.default_rng(0)
        canvas = rng.integers(0, 256, (4, 64, 64, 3), np.uint8)
        sizes = np.full((4, 2), 48, np.int32)
        hot = np.zeros((4, 3), np.float32)
        hot[[0, 1, 2, 3], [0, 1, 2, 0]] = 1.0
        hot[0, 2] = 1.0  # one genuinely multi-label row
        _, _, history = tuner.run(
            variables, iter([(canvas, sizes, hot)] * 3)
        )
        assert len(history) == 3
        assert all(np.isfinite(h["loss"]) for h in history)
        assert all(0.0 <= h["accuracy"] <= 1.0 for h in history)

    def test_augmented_multilabel_with_mixup_on_mesh(self):
        from ics_tpu.models.resnet import resnet_tiny
        from ics_tpu.ops.augment import AugmentConfig
        from ics_tpu.parallel.mesh import make_mesh
        from ics_tpu.train.finetune import FineTuner

        model = resnet_tiny(num_classes=2)
        variables = model.init(jax.random.PRNGKey(0))
        mesh = make_mesh((2,), ("data",), devices=jax.devices()[:2])
        tuner = FineTuner(
            model, image_size=32, resize_short=32,
            compute_dtype=jnp.float32, multi_label=True, mesh=mesh,
            augment=AugmentConfig(mixup_alpha=0.2, label_smoothing=0.1),
        )
        rng = np.random.default_rng(1)
        canvas = rng.integers(0, 256, (4, 64, 64, 3), np.uint8)
        sizes = np.full((4, 2), 48, np.int32)
        hot = np.asarray(
            [[1, 0], [1, 1], [0, 1], [1, 0]], np.float32
        )
        _, _, history = tuner.run(
            variables, iter([(canvas, sizes, hot)] * 2)
        )
        assert len(history) == 2
        assert all(np.isfinite(h["loss"]) for h in history)


class TestEngineMultilabel:
    def test_sigmoid_scores_cross_check_softmax_twin(self):
        """Same seed -> same folded weights -> same logits: recovering the
        logits from the sigmoid engine's scores and softmaxing them must
        reproduce the softmax engine's scores exactly (num_classes <=
        TOP_K so both return ALL classes)."""
        from ics_tpu.runtime.engine import InferenceEngine

        kw = dict(num_classes=4, precision="fp32", buckets=(2,), canvas=64)
        sig = InferenceEngine("resnet_tiny", multi_label=True, **kw)
        soft = InferenceEngine("resnet_tiny", **kw)
        rng = np.random.default_rng(0)
        canvas = rng.integers(0, 256, (2, 64, 64, 3), np.uint8)
        sizes = np.full((2, 2), 64, np.int32)
        sidx, sig_scores = sig.predict_staged(canvas, sizes)
        fidx, soft_scores = soft.predict_staged(canvas, sizes)
        assert sig_scores.shape == (2, 4)
        assert ((sig_scores > 0.0) & (sig_scores < 1.0)).all()
        # softmax over the full class set sums to 1; sigmoids don't
        np.testing.assert_allclose(soft_scores.sum(axis=1), 1.0, atol=1e-5)
        # logit recovery: l = log(p/(1-p)); align by class index
        for row in range(2):
            logits = np.full(4, np.nan)
            logits[sidx[row]] = np.log(
                sig_scores[row] / (1.0 - sig_scores[row])
            )
            ex = np.exp(logits - logits.max())
            want = ex / ex.sum()
            got = np.full(4, np.nan)
            got[fidx[row]] = soft_scores[row]
            np.testing.assert_allclose(want, got, atol=1e-3)
        # scores sorted descending (top_k contract preserved)
        assert (np.diff(sig_scores[0]) <= 1e-6).all()

    def test_multilabel_returns_all_classes_beyond_top_k(self):
        """num_classes > TOP_K: the sigmoid engine must return EVERY
        class (each is an independent decision vs the serving limiar);
        the softmax engine keeps the top-k cap."""
        from ics_tpu.runtime.engine import TOP_K, InferenceEngine

        n_cls = TOP_K + 3
        kw = dict(num_classes=n_cls, precision="fp32", buckets=(2,),
                  canvas=64)
        sig = InferenceEngine("resnet_tiny", multi_label=True, **kw)
        soft = InferenceEngine("resnet_tiny", **kw)
        rng = np.random.default_rng(2)
        canvas = rng.integers(0, 256, (2, 64, 64, 3), np.uint8)
        sizes = np.full((2, 2), 64, np.int32)
        sidx, sig_scores = sig.predict_staged(canvas, sizes)
        _, soft_scores = soft.predict_staged(canvas, sizes)
        assert sig_scores.shape == (2, n_cls)
        assert sorted(sidx[0]) == list(range(n_cls))
        assert soft_scores.shape == (2, TOP_K)
