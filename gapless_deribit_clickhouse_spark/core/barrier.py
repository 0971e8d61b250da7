"""Storage level for ``localCheckpoint`` barriers — SERIALIZED.

Spark's default ``localCheckpoint`` storage level keeps the
materialized rows DESERIALIZED (``MEMORY_AND_DISK``): every element
appended to the block's ``SizeTrackingVector`` periodically re-samples
the block's size with ``SizeEstimator``, which walks the stored row
OBJECT GRAPHS (strings, nested arrays) against a process-wide
class-info cache. With 32 local executor threads checkpointing a wide
table simultaneously this convoys: the round-9 scale probe caught it
live — 93% SYSTEM time, every executor futex-spinning under
``SizeEstimator.visitArray`` / ``IdentityHashMap.put``, one task
burning 670 CPU-seconds on a cell that costs ~5 s with serialized
blocks, and cell timings swinging 5 s -> 86 s run to run as the
convoy did or didn't form.

``MEMORY_AND_DISK_SER`` stores the serialized BYTES instead: size
tracking becomes byte arithmetic (no object walk), blocks are 2-5x
smaller (UnsafeRow bytes vs boxed object graphs), and the
serialize/deserialize cost is one predictable pass. That is the
scale-safe trade at any executor count, so every barrier in the
engine uses it:

    .localCheckpoint(eager=..., storageLevel=BARRIER_STORAGE)
"""

from __future__ import annotations

from pyspark.storagelevel import StorageLevel

# (useDisk=True, useMemory=True, useOffHeap=False, deserialized=False)
# — memory-and-disk with SERIALIZED in-memory blocks. Built explicitly
# because the name differs across API surfaces (PySpark's
# ``StorageLevel.MEMORY_AND_DISK`` already carries deserialized=False
# for RDD-era reasons; the Scala constant of the same name does not).
BARRIER_STORAGE = StorageLevel(True, True, False, False, 1)
