"""Initial schema: all 13 tables + indexes from ics_tpu.db.models."""

from ics_tpu.db.orm import create_table_sql, models_in_fk_order

revision = "0001_initial_schema"
down_revision = None


def upgrade(session) -> None:
    import ics_tpu.db.models  # noqa: F401 — ensure registry is populated

    for model in models_in_fk_order():
        for stmt in create_table_sql(model):
            session.execute(stmt)
