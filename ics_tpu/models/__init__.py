from ics_tpu.models.registry import get_model, list_models, register_model  # noqa: F401
