"""Initial schema: all 13 tables + indexes from ics_tpu.db.models."""

from ics_tpu.db.orm import MODEL_REGISTRY, create_table_sql

revision = "0001_initial_schema"
down_revision = None


def upgrade(session) -> None:
    import ics_tpu.db.models  # noqa: F401 — ensure registry is populated

    for model in MODEL_REGISTRY.values():
        for stmt in create_table_sql(model):
            session.execute(stmt)
