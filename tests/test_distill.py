"""Distillation: model suggestions as pseudo-labels for fine-tuning.

`suggested_examples` semantics (threshold, human-label precedence,
latest-suggestion-wins) + the job-level `usar_sugestoes` wiring through
the /treinamento route.
"""

import asyncio
import datetime

import httpx
import pytest

from ics_tpu.core import timezone as tz
from ics_tpu.core.security import sha256_hex
from ics_tpu.db.models import SugestaoModelo
from ics_tpu.train.data import labeled_examples, suggested_examples
from tests.fake_nextcloud import make_jpeg

from tests.test_train_serve_e2e import ADMIN, _login, app  # noqa: F401


def _add_suggestion(s, id_img, id_amb, id_opc, score, when):
    s.add(SugestaoModelo(
        id_img=id_img, id_amb=id_amb, id_opc=id_opc, modelo="resnet_tiny",
        versao=1, score=score, classes=[], data_criado=when,
    ))


@pytest.mark.anyio
async def test_suggested_examples_semantics(app):  # noqa: F811
    db = app.state.db
    id_amb = app.state.id_amb
    opcoes = list(app.state.opcoes)  # [id_op1, id_op2]
    unlabeled = app.state.unlabeled  # 2 images without human labels
    now = tz.utcnow()
    earlier = now - datetime.timedelta(hours=1)

    examples, class_map = labeled_examples(db, id_amb)
    human_hashes = {e["content_hash"] for e in examples}
    labeled_img = examples[0]["content_hash"]

    with db.session() as s:
        # high-confidence on an unlabeled image -> included
        _add_suggestion(s, unlabeled[0], id_amb, opcoes[0], 0.97, earlier)
        # superseded by a NEWER suggestion with a different option
        _add_suggestion(s, unlabeled[0], id_amb, opcoes[1], 0.95, now)
        # a NEWER low-confidence suggestion supersedes (and disqualifies)
        # an older high-confidence one — stale labels from a demoted model
        # must not survive
        _add_suggestion(s, unlabeled[1], id_amb, opcoes[0], 0.97, earlier)
        _add_suggestion(s, unlabeled[1], id_amb, opcoes[0], 0.51, now)
        # suggestion for a human-labeled image -> excluded (humans win)
        _add_suggestion(s, labeled_img, id_amb, opcoes[0], 0.99, now)
        s.commit()

    pseudo = suggested_examples(
        db, id_amb, class_map, min_score=0.9, exclude_hashes=human_hashes
    )
    assert len(pseudo) == 1
    assert pseudo[0]["content_hash"] == unlabeled[0]
    # the NEWEST suggestion's option defines the label
    assert pseudo[0]["label"] == class_map[opcoes[1]]
    assert pseudo[0]["fonte"] == "sugestao"

    # lower threshold admits the 0.51 suggestion too
    pseudo_low = suggested_examples(
        db, id_amb, class_map, min_score=0.5, exclude_hashes=human_hashes
    )
    assert {p["content_hash"] for p in pseudo_low} == set(unlabeled)


@pytest.mark.anyio
async def test_job_mixes_suggestions(app):  # noqa: F811
    db = app.state.db
    id_amb = app.state.id_amb
    opcoes = list(app.state.opcoes)
    now = tz.utcnow()
    with db.session() as s:
        for h in app.state.unlabeled:
            _add_suggestion(s, h, id_amb, opcoes[0], 0.95, now)
        s.commit()

    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(transport=transport, base_url="http://t") as c:
        admin = await _login(c, **ADMIN)
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "max_steps": 2, "batch_size": 4,
                  "epochs": 50, "canvas": 64, "usar_sugestoes": True},
            headers=admin,
        )
        assert r.status_code == 202, r.text
        id_job = r.json()["id_job"]

        # non-bool flag is a 422, not silently-enabled
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"usar_sugestoes": "sim"}, headers=admin,
        )
        assert r.status_code == 422

        for _ in range(600):
            r = await c.get(f"/treinamento/jobs/{id_job}", headers=admin)
            status = r.json()
            if status["status"] in ("concluido", "falhou"):
                break
            await asyncio.sleep(0.25)
        assert status["status"] == "concluido", status
        assert status["sugestoes"] == 2  # both unlabeled images mixed in
        assert status["exemplos"] > status["sugestoes"]
