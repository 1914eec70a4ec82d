"""disco_tpu — a TPU-native overlap-layout-consensus (OLC) metagenome
co-assembly engine with the capabilities of Disco (abiswas-odu/Disco), built
from scratch on JAX/XLA/Pallas.

Architecture (TPU-first, not a port):

- ``io``       host-side FASTA/FASTQ streaming, read QC, 2-bit packing.
- ``index``    sorted canonical (L-1)-mer fingerprint table (replaces the
               reference's chained prefix/suffix hash table,
               reference: src/BuildGraph/src/HashTable.cpp).
- ``overlap``  device-batched candidate generation + packed-word overlap
               verification (replaces the byte-wise substring compares in
               reference: src/BuildGraph/src/OverlapGraph.cpp:517-595).
- ``buildg``   graph-construction front end: containment marking, edge
               relation, transitive reduction, parity-exact replay of the
               reference's traversal for bit-identical outputs.
- ``simplify`` graph simplification operators, min-cost-flow pruning,
               contig emission, scaffolding (reference: src/SimplifyGraph).
- ``dist``     multi-chip sharding of the overlap phase over a
               jax.sharding.Mesh (replaces MPI / MPI-3 RMA).
- ``utils``    config, logging, stats (assemblyStats parity), checkpoints.

64-bit integer support is required for fingerprint keys; we enable it once
at package import.
"""
import jax

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
