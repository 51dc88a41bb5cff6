"""dart_tpu — a TPU-native RNA-seq spliced short-read aligner.

A from-scratch rebuild of the capabilities of Dart (Lin & Hsu, 2018;
reference C++ implementation surveyed in SURVEY.md) designed TPU-first:

- FM-index seeding and suffix-array location run as batched, gather-heavy
  JAX/Pallas kernels over an HBM-resident index (``dart_tpu.ops``).
- Gap closing uses a batched Needleman-Wunsch kernel with the reference's
  exact scoring semantics (``dart_tpu.ops.nw_*``).
- Chaining and alignment finalization (the divide-and-conquer candidate
  pipeline) live in ``dart_tpu.pipeline``.
- Index construction/loading with BWA-compatible on-disk formats plus a
  TPU-friendly layout lives in ``dart_tpu.index``.
- Reads stream data-parallel over a ``jax.sharding.Mesh``
  (``dart_tpu.parallel``); splice-junction tables and counters merge via
  collectives.
"""

__version__ = "0.1.0"
