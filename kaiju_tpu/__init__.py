"""kaiju-tpu: a TPU-native metagenomic protein classifier.

A from-scratch reimplementation of the capabilities of Kaiju
(bioinformatics-centre/kaiju v1.10.1): taxonomic classification of DNA
sequencing reads by six-frame translation and FM-index search against a
reference protein database, with LCA assignment over the NCBI taxonomy.

Architecture (TPU-first, not a port):
  - Index toolchain (host): builds a plain-array FM index ("`.ktx`") designed
    for vectorized rank queries (uint8 BWT + dense int32 occ checkpoints),
    instead of the reference's byte-packed letter+count encoding
    (reference: src/bwt/compactfmi.c).
  - Search kernels (JAX/Pallas): batched backward-search wavefronts over
    lanes of (fragment, end-position), with active-lane masking.
  - Classification engine: host orchestration replicating the reference
    semantics exactly (reference: src/ConsumerThread.cpp) with all rank
    queries executed in device batches.
  - Distribution: jax.sharding mesh; reads are data-parallel, the index is
    replicated or position-sharded with psum merge (see kaiju_tpu.parallel).
"""

__version__ = "0.1.0"

# Reference parity target: Kaiju v1.10.1 (src/version.hpp:7)
REFERENCE_VERSION = "1.10.1"
