"""Vectorized scalar kernels used inside ``map_batches`` stages.

The reference implements its scalar surface as Spark UDFs over JTS/GeoTools
(/root/reference/src/main/scala/io/arlas/data/utils/GeoTool.scala). Here the
equivalents are numpy / pyarrow.compute kernels that operate on whole Arrow
arrays — never per-row Python in a hot stage.
"""

from arlas_proc_ray.functions.hashing import (
    key_hash,
    partition_ids,
    sha256_hex,
    sha256_rollup,
)

__all__ = ["sha256_hex", "sha256_rollup", "key_hash", "partition_ids"]
