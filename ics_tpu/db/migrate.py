"""Migration engine (alembic-equivalent, from scratch).

Revisions are python modules in ``ics_tpu/db/migrations/`` named
``m<NNNN>_<slug>.py`` exposing ``revision``, ``down_revision`` and
``upgrade(session)``.  Applied revisions are recorded in
``schema_migrations``.  ``upgrade_head`` applies pending revisions in chain
order (prod startup); ``stamp_head`` records them without running (dev
startup after ``create_all`` — reference parity with
``app/db/run_migrations.py:26-42``).
"""

from __future__ import annotations

import importlib
import logging
import pkgutil
from typing import Optional

from ics_tpu.db.engine import Database

logger = logging.getLogger(__name__)

MIGRATIONS_PACKAGE = "ics_tpu.db.migrations"


def _load_revisions() -> list:
    package = importlib.import_module(MIGRATIONS_PACKAGE)
    modules = []
    for info in pkgutil.iter_modules(package.__path__):
        if info.name.startswith("m"):
            modules.append(
                importlib.import_module(f"{MIGRATIONS_PACKAGE}.{info.name}")
            )
    # order by down_revision chain
    by_parent = {getattr(m, "down_revision", None): m for m in modules}
    ordered = []
    cursor: Optional[str] = None
    while cursor in by_parent:
        mod = by_parent[cursor]
        ordered.append(mod)
        cursor = mod.revision
    if len(ordered) != len(modules):
        raise RuntimeError("broken migration chain")
    return ordered


def _ensure_table(session) -> None:
    session.execute(
        "CREATE TABLE IF NOT EXISTS schema_migrations ("
        "revision TEXT PRIMARY KEY, applied_at TEXT NOT NULL)"
    )


def applied_revisions(session) -> set[str]:
    _ensure_table(session)
    return {r["revision"] for r in session.fetchall("SELECT revision FROM schema_migrations")}


def upgrade_head(db: Database) -> list[str]:
    from ics_tpu.core.timezone import utcnow

    applied: list[str] = []
    with db.session() as s:
        done = applied_revisions(s)
        for mod in _load_revisions():
            if mod.revision in done:
                continue
            logger.info("applying migration %s", mod.revision)
            mod.upgrade(s)
            s.execute(
                "INSERT INTO schema_migrations (revision, applied_at) VALUES (?, ?)",
                (mod.revision, utcnow().isoformat()),
            )
            applied.append(mod.revision)
        s.commit()
    return applied


def downgrade(db: Database, target: str = "-1") -> list[str]:
    """Revert applied revisions until ``target`` is the head.

    ``target`` is a revision id (full, or unambiguous prefix like
    ``"0004"``), ``"base"`` (revert everything), or ``"-1"`` (revert just
    the newest applied revision) — alembic's CLI semantics
    (reference ``alembic downgrade``; every reference revision implements
    ``downgrade()``, e.g.
    ``alembic/versions/a3f2b1c4d5e6_add_sync_status_columns.py:44``).

    Each reverted revision runs its ``downgrade(session)`` and has its
    ``schema_migrations`` row deleted, newest first, one commit at the
    end (all-or-nothing like ``upgrade_head``)."""
    chain = _load_revisions()
    reverted: list[str] = []
    with db.session() as s:
        done = applied_revisions(s)
        applied_chain = [m for m in chain if m.revision in done]
        if not applied_chain:
            return []
        if target == "-1":
            to_revert = applied_chain[-1:]
        elif target == "base":
            to_revert = applied_chain
        else:
            matches = [
                i for i, m in enumerate(applied_chain)
                if m.revision == target or m.revision.startswith(target)
            ]
            if len(matches) != 1:
                raise ValueError(
                    f"target revision {target!r} is "
                    + ("ambiguous" if matches else "not an applied revision")
                )
            to_revert = applied_chain[matches[0] + 1:]
        for mod in reversed(to_revert):
            fn = getattr(mod, "downgrade", None)
            if fn is None:
                raise RuntimeError(
                    f"revision {mod.revision} has no downgrade()"
                )
            logger.info("reverting migration %s", mod.revision)
            fn(s)
            s.execute(
                "DELETE FROM schema_migrations WHERE revision = ?",
                (mod.revision,),
            )
            reverted.append(mod.revision)
        s.commit()
    return reverted


def stamp_head(db: Database) -> list[str]:
    from ics_tpu.core.timezone import utcnow

    stamped: list[str] = []
    with db.session() as s:
        done = applied_revisions(s)
        for mod in _load_revisions():
            if mod.revision in done:
                continue
            s.execute(
                "INSERT INTO schema_migrations (revision, applied_at) VALUES (?, ?)",
                (mod.revision, utcnow().isoformat()),
            )
            stamped.append(mod.revision)
        s.commit()
    return stamped
