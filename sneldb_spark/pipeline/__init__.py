"""Large-scale training-data pipeline operators (beyond the reference surface).

All operators are built from JVM-side built-in functions wherever possible —
per-row Python is reserved for genuinely opaque work (multimodal decode),
and even there it's Arrow-batched `mapInPandas`, never row-at-a-time UDFs.
"""
