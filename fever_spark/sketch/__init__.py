"""Pure-numpy sketch kernels. Zero Spark dependencies.

Every sketch implements the uniform mergeable-state contract
(SURVEY.md §2.8 "Sketch ABC"):

- ``update(values)``        vectorized bulk update from a numpy array
- ``merge(other)``          associative + commutative in-place merge
- ``to_bytes()/from_bytes`` versioned little-endian binary state
- an estimator (``estimate`` / ``contains`` / ``quantile`` — per sketch)

The binary format mirrors the reference's versioned little-endian flow-record
framing (/root/reference/types/flow_event.go:93-99): a fixed magic + version +
kind header, then fixed-order LE params, then the payload arrays.
"""

from fever_spark.sketch.base import Sketch, sketch_from_bytes, SKETCH_REGISTRY
from fever_spark.sketch.bloom import BloomFilter
from fever_spark.sketch.hll import HyperLogLog
from fever_spark.sketch.cms import CountMinSketch
from fever_spark.sketch.kll import KLLSketch
from fever_spark.sketch.tdigest import TDigest
from fever_spark.sketch.topk import CMSTopK
from fever_spark.sketch.kmv import (
    KMVSketch, kmv_intersection_estimate, kmv_jaccard, kmv_union_estimate)

__all__ = [
    "Sketch",
    "sketch_from_bytes",
    "SKETCH_REGISTRY",
    "BloomFilter",
    "HyperLogLog",
    "CountMinSketch",
    "KLLSketch",
    "TDigest",
    "CMSTopK",
    "KMVSketch",
    "kmv_jaccard",
    "kmv_union_estimate",
    "kmv_intersection_estimate",
]
