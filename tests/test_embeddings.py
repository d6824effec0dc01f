"""Embedding extraction + similarity search (net-new TPU tier).

The reference can only answer exact SHA-256 identity
(``app/api/routes/images.py:18-101``); this tier answers visual
similarity: generic identity-head feature extraction on the engine, fp16
vector storage, on-device cosine top-k, and the
``/images/buscar-similares`` / ``/inferencia/indexar`` surfaces.
"""

import io

import httpx
import numpy as np
import pytest

from ics_tpu.core import timezone as tz
from ics_tpu.core.security import sha256_hex
from ics_tpu.crud.embedding_crud import (
    contar_embeddings,
    decode_vector,
    encode_vector,
    get_embedding,
    hashes_sem_embedding,
    upsert_embedding,
)
from ics_tpu.db.engine import Database
from ics_tpu.db.models import ConjuntoImagens, Imagem
from ics_tpu.runtime.embedding_index import EmbeddingIndex, _rows_bucket
from tests.fake_nextcloud import make_jpeg

ADMIN = {"username": "admin@seudominio.com", "password": "senha_super_secreta"}


class TestVectorCodec:
    def test_roundtrip(self):
        v = np.random.default_rng(0).normal(size=(512,)).astype(np.float32)
        v /= np.linalg.norm(v)
        out = decode_vector(encode_vector(v), 512)
        # fp16 quantization of a unit vector: tiny elementwise error
        np.testing.assert_allclose(out.astype(np.float32), v, atol=2e-3)

    def test_dim_mismatch_is_loud(self):
        v = np.zeros(8, np.float32)
        with pytest.raises(ValueError):
            decode_vector(encode_vector(v), 16)


class TestEngineEmbed:
    @pytest.fixture(scope="class")
    def engine(self):
        from ics_tpu.runtime.engine import InferenceEngine

        return InferenceEngine(
            "resnet_tiny", num_classes=7, precision="fp32",
            buckets=(4,), canvas=64,
        )

    def test_shapes_and_normalization(self, engine):
        canvas = np.random.default_rng(0).integers(
            0, 255, (3, 64, 64, 3)
        ).astype(np.uint8)
        sizes = np.full((3, 2), 64, np.int32)
        feats = engine.embed_staged(canvas, sizes)
        assert feats.shape == (3, engine.embed_dim)
        assert feats.dtype == np.float32
        np.testing.assert_allclose(
            np.linalg.norm(feats, axis=-1), 1.0, atol=1e-4
        )

    def test_identity_head_matches_logits(self, engine):
        """head(raw features) must equal the classify path's logits — the
        identity-head trick extracts exactly the penultimate features."""
        import jax.numpy as jnp

        from ics_tpu.ops.preproc import preprocess_batch

        canvas = np.random.default_rng(1).integers(
            0, 255, (2, 64, 64, 3)
        ).astype(np.uint8)
        sizes = np.full((2, 2), 64, np.int32)
        engine._get_embed_step()  # builds _embed_folded
        x = preprocess_batch(canvas, sizes, out_size=64, resize_short=64,
                             dtype=jnp.float32)
        raw = np.asarray(
            engine.model.apply_folded(engine._embed_folded, x), np.float32
        )
        logits = np.asarray(
            engine.model.apply_folded(engine.folded, x), np.float32
        )
        w = np.asarray(engine.folded["head"]["w"], np.float32)
        b = np.asarray(engine.folded["head"]["b"], np.float32)
        np.testing.assert_allclose(raw @ w + b, logits, rtol=1e-3, atol=1e-3)
        # embed_staged is exactly those features, L2-normalized
        feats = engine.embed_staged(canvas, sizes)
        np.testing.assert_allclose(
            feats,
            raw / np.linalg.norm(raw, axis=-1, keepdims=True),
            rtol=1e-3, atol=1e-3,
        )


class TestEmbeddingIndex:
    def _db_with_vectors(self, tmp_path, vecs: dict[str, np.ndarray]):
        db = Database(f"sqlite:///{tmp_path}/emb.db")
        db.create_all()
        now = tz.utcnow()
        with db.session() as s:
            cnj = ConjuntoImagens(
                nome_conj="e", caminho_conj="/e", file_id="5",
                imagens_sincronizadas=True, data_proc=now, data_sinc=now,
            )
            s.add(cnj)
            s.flush()
            for h, v in vecs.items():
                s.add(Imagem(
                    content_hash=h, nome_img="x.jpg", caminho_img=f"e/{h[:4]}.jpg",
                    data_proc=now, data_sinc=now, id_cnj=cnj.id_cnj,
                ))
                upsert_embedding(s, h, "m", v)
            s.commit()
        return db

    def test_rows_bucket_powers_of_two(self):
        assert _rows_bucket(1) == 128
        assert _rows_bucket(128) == 128
        assert _rows_bucket(129) == 256
        assert _rows_bucket(1000) == 1024

    def test_search_matches_numpy(self, tmp_path):
        rng = np.random.default_rng(0)
        vecs = {}
        for i in range(20):
            v = rng.normal(size=(32,)).astype(np.float32)
            vecs[f"{i:02d}" + "c" * 62] = v / np.linalg.norm(v)
        db = self._db_with_vectors(tmp_path, vecs)
        index = EmbeddingIndex(db, "m")
        q = rng.normal(size=(32,)).astype(np.float32)
        q /= np.linalg.norm(q)
        got = index.search(q, k=5)
        hashes = sorted(vecs)
        mat = np.stack([vecs[h] for h in hashes]).astype(np.float16)
        ref_scores = mat.astype(np.float32) @ q
        ref_order = [hashes[i] for i in np.argsort(-ref_scores)[:5]]
        assert [g["content_hash"] for g in got] == ref_order
        assert got[0]["score"] == pytest.approx(
            float(ref_scores.max()), abs=2e-2
        )

    def test_exclude_min_score_and_refresh(self, tmp_path):
        v = np.zeros(8, np.float32)
        v[0] = 1.0
        u = np.zeros(8, np.float32)
        u[1] = 1.0
        h_v, h_u = "v" * 64, "u" * 64
        db = self._db_with_vectors(tmp_path, {h_v: v, h_u: u})
        index = EmbeddingIndex(db, "m")
        got = index.search(v, k=5, exclude=h_v)
        assert [g["content_hash"] for g in got] == [h_u]
        assert index.search(v, k=5, min_score=0.5) == [
            {"content_hash": h_v, "score": pytest.approx(1.0, abs=1e-3)}
        ]
        # new row picked up without rebuilding the object (version key)
        w = (v + u) / np.linalg.norm(v + u)
        now = tz.utcnow()
        with db.session() as s:
            s.add(Imagem(
                content_hash="w" * 64, nome_img="w.jpg", caminho_img="e/w.jpg",
                data_proc=now, data_sinc=now,
                id_cnj=s.query(ConjuntoImagens).all()[0].id_cnj,
            ))
            upsert_embedding(s, "w" * 64, "m", w)
            s.commit()
        got = index.search(v, k=1, exclude=h_v)
        assert got[0]["content_hash"] == "w" * 64

    def test_empty_corpus(self, tmp_path):
        db = Database(f"sqlite:///{tmp_path}/empty.db")
        db.create_all()
        assert EmbeddingIndex(db, "m").search(np.zeros(4), k=3) == []

    def test_negative_cosine_matches_beat_padding(self, tmp_path):
        """Padding rows score exactly 0; with a small corpus in the
        128-row bucket, every real row with NEGATIVE cosine ranked below
        all (bucket - n) pads and the top-64 filled with padding — valid
        results silently vanished (review r5). Pads are now masked to
        -inf before top_k."""
        rng = np.random.default_rng(7)
        q = rng.normal(size=(16,)).astype(np.float32)
        q /= np.linalg.norm(q)
        vecs = {}
        for i in range(3):
            v = rng.normal(size=(16,)).astype(np.float32)
            v /= np.linalg.norm(v)
            if v @ q > 0:  # force every corpus row to score NEGATIVE
                v = -v
            vecs[f"{i:02d}" + "n" * 62] = v
        db = self._db_with_vectors(tmp_path, vecs)
        got = EmbeddingIndex(db, "m").search(q, k=3)
        assert len(got) == 3  # all real rows returned, best-first
        assert all(g["score"] < 0 for g in got)
        scores = [g["score"] for g in got]
        assert scores == sorted(scores, reverse=True)


class TestCrudQueues:
    def test_hashes_sem_embedding(self, tmp_path):
        db = Database(f"sqlite:///{tmp_path}/q.db")
        db.create_all()
        now = tz.utcnow()
        with db.session() as s:
            cnj = ConjuntoImagens(
                nome_conj="q", caminho_conj="/q", file_id="6",
                imagens_sincronizadas=True, data_proc=now, data_sinc=now,
            )
            s.add(cnj)
            s.flush()
            for i in range(3):
                s.add(Imagem(
                    content_hash=f"{i:02d}" + "d" * 62, nome_img=f"{i}.jpg",
                    caminho_img=f"q/{i}.jpg", data_proc=now, data_sinc=now,
                    id_cnj=cnj.id_cnj,
                ))
            # tombstoned images never enter the queue
            s.add(Imagem(
                content_hash="99" + "d" * 62, nome_img="gone.jpg",
                caminho_img="q/gone.jpg", data_proc=now, data_sinc=now,
                id_cnj=cnj.id_cnj, existe_no_nextcloud=False,
            ))
            upsert_embedding(s, "00" + "d" * 62, "m", np.zeros(4, np.float32))
            s.commit()
            pend = hashes_sem_embedding(s, "m")
            assert [p["content_hash"] for p in pend] == [
                "01" + "d" * 62, "02" + "d" * 62
            ]
            assert contar_embeddings(s, "m") == 1
            assert get_embedding(s, "00" + "d" * 62, "m").shape == (4,)


# --- API surface -------------------------------------------------------------


@pytest.fixture()
async def app(tmp_path):
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
        db = Database(f"sqlite:///{tmp_path}/emb_api.db")
        a = create_app(db=db)
        await a.startup()
        blobs = _seed_images(db)
        assert a.state.trainer is not None
        a.state.trainer.fetch_bytes = lambda h, path: blobs[h]
        a.state.blobs = blobs
        yield a
        await a.shutdown()
    finally:
        reload_settings()


def _seed_images(db: Database) -> dict[str, bytes]:
    now = tz.utcnow()
    blobs: dict[str, bytes] = {}
    with db.session() as s:
        cnj = ConjuntoImagens(
            nome_conj="sim", caminho_conj="/sim", file_id="8",
            imagens_sincronizadas=True, data_proc=now, data_sinc=now,
        )
        s.add(cnj)
        s.flush()
        for i in range(6):
            data = make_jpeg(i, size=(60, 60))
            h = sha256_hex(data)
            blobs[h] = data
            s.add(Imagem(
                content_hash=h, nome_img=f"{i}.jpg",
                caminho_img=f"sim/{i}.jpg",
                data_proc=now, data_sinc=now, id_cnj=cnj.id_cnj,
            ))
        s.commit()
    return blobs


async def _login(client) -> dict:
    r = await client.post("/auth/login", data=ADMIN)
    assert r.status_code == 200, r.text
    client.cookies.clear()
    return {"Authorization": f"Bearer {r.json()['access_token']}"}


@pytest.mark.anyio
async def test_indexar_then_search(app):
    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(
        transport=transport, base_url="http://t", timeout=120
    ) as c:
        admin = await _login(c)

        # 1. backfill: all 6 seeded images get embeddings
        r = await c.post("/inferencia/indexar", json={}, headers=admin)
        assert r.status_code == 200, r.text
        body = r.json()
        assert body["indexadas"] == 6
        assert body["pendentes"] == 0
        assert body["total_indexadas"] == 6
        assert body["modelo"] == "resnet_tiny"
        # idempotent: a second pass has nothing to do
        r = await c.post("/inferencia/indexar", json={}, headers=admin)
        assert r.json()["indexadas"] == 0

        # 2. self-similarity: uploading a SYNCED image must surface its
        #    near-duplicates first and exclude itself
        blobs = app.state.blobs
        query_hash, query_bytes = next(iter(blobs.items()))
        r = await c.post(
            "/images/buscar-similares?limite=3",
            files={"file": ("q.jpg", query_bytes, "image/jpeg")},
        )
        assert r.status_code == 200, r.text
        body = r.json()
        assert body["hash_consulta"] == query_hash
        got = [s["content_hash"] for s in body["similares"]]
        assert query_hash not in got
        assert len(got) == 3
        assert all(
            s1["score"] >= s2["score"]
            for s1, s2 in zip(body["similares"], body["similares"][1:])
        )
        assert body["similares"][0]["download_url"].startswith(
            "/nextcloud/images/"
        )

        # 3. near-duplicate detection: the same image re-encoded at a
        #    different JPEG quality is not hash-identical but must match
        #    at a near-1.0 cosine score
        from PIL import Image

        img = Image.open(io.BytesIO(query_bytes)).convert("RGB")
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=35)
        dup_bytes = buf.getvalue()
        assert sha256_hex(dup_bytes) != query_hash
        r = await c.post(
            "/images/buscar-similares?apenas_duplicatas=true",
            files={"file": ("d.jpg", dup_bytes, "image/jpeg")},
        )
        assert r.status_code == 200, r.text
        dups = r.json()["similares"]
        assert [d["content_hash"] for d in dups] == [query_hash]
        assert dups[0]["score"] >= 0.98

        # 4. neighbours of a synced image by hash (excludes itself)
        r = await c.get(f"/images/{query_hash}/similares?limite=2")
        assert r.status_code == 200, r.text
        body = r.json()
        assert body["content_hash"] == query_hash
        assert len(body["similares"]) == 2
        assert query_hash not in [
            s["content_hash"] for s in body["similares"]
        ]

        # 5. unindexed hash -> 404; bad limite -> 422; missing file -> 422
        r = await c.get(f"/images/{'f' * 64}/similares")
        assert r.status_code == 404
        r = await c.get(f"/images/{query_hash}/similares?limite=x")
        assert r.status_code == 422
        r = await c.post("/images/buscar-similares")
        assert r.status_code == 422

        # 6. indexar is admin-only
        r = await c.post("/inferencia/indexar", json={})
        assert r.status_code == 401
