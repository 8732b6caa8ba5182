from arlas_proc_ray.transform.base import (
    BatchTransform,
    KeyedTransform,
    Pipeline,
    SchemaContractError,
    Transform,
)

__all__ = [
    "Transform",
    "BatchTransform",
    "KeyedTransform",
    "Pipeline",
    "SchemaContractError",
]
