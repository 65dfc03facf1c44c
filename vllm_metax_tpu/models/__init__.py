from vllm_metax_tpu.models.registry import ModelRegistry, get_model  # noqa: F401
