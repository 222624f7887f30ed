"""fhe_gpt2_tpu — a TPU-native RNS-CKKS homomorphic-encryption framework.

Built from scratch in JAX/XLA/Pallas with the capability set of the reference
CPU stack (tleong073/FHE-GPT-2, a modified Microsoft SEAL 3.6.6): RNS-CKKS
arithmetic, hybrid key switching, Galois rotations, full bootstrapping,
minimax/Remez polynomial approximation machinery, and the encrypted NN kernel
library (packed matmuls, folds, softmax/GELU/LayerNorm approximations) that
drives encrypted ResNet-20..110 on CIFAR and encrypted GPT-2 blocks.

Design notes (TPU-first, not a port):
  * Ciphertext polynomials are stored as ``uint64[..., L, N]`` JAX arrays.
    On TPU, XLA emulates 64-bit integers on 32-bit lanes; hot kernels get
    Pallas fast paths operating on bit-cast u32 pairs.
  * Everything on the evaluation path is functional and jittable: a
    ``CkksContext`` (moduli, NTT twiddles, Barrett constants, Galois maps)
    is closed over by jitted ops; ciphertexts are pytrees.
  * NN kernels are written once against a small slot-vector backend protocol
    and run on either the encrypted backend or a plaintext simulator
    (replacing the reference's duplicated C++/Python implementations).
  * Multi-chip scaling uses jax.sharding over a Mesh: RNS limbs and the
    ciphertext batch axis are sharded; key-switch digit products reduce via
    psum over ICI.
"""

import jax

# 64-bit integers are required for the canonical modular-arithmetic layer.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
