"""sgfhe_tpu — a TPU-native FHE framework implementing Shuhong Gao's scheme
(eprint 2018/637) with the capabilities of nucypher/SGFHE.jl, rebuilt from
scratch on JAX/XLA/Pallas (see SURVEY.md for the capability map).

Public API mirrors the reference's export list (reference src/SGFHE.jl:10-20):
Params, PrivateKey, PublicKey, BootstrapKey, encrypt, encrypt_optimal,
normalize_ciphertext, decrypt, split_ciphertext, bootstrap,
pack_encrypted_bits — plus the Scheme2 submodule (src/SGFHE.jl:22-30).
"""

from .models.params import Params
from .models.scheme1 import (
    SchemeContext,
    make_context,
    RLWE,
    LWE,
    PackedCiphertext,
    Ciphertext,
    EncryptedBit,
    PrivateEncryptedCiphertext,
    PublicEncryptedCiphertext,
    PrivateKey,
    PublicKey,
    BootstrapKey,
    encrypt,
    encrypt_public,
    encrypt_optimal,
    normalize_ciphertext,
    decrypt,
    decrypt_bit,
    split_ciphertext,
    deterministic_expand,
)
from .models.bootstrap import (
    bootstrap,
    bootstrap_batch,
    pack_encrypted_bits,
)
from .models import scheme2 as Scheme2  # noqa: F401  (submodule, like the ref)
from . import circuit  # noqa: F401  (boolean-circuit evaluation layer)
from .circuit import Circuit, evaluate as evaluate_circuit
from .prewarm import prewarm

__all__ = [
    "Params", "SchemeContext", "make_context",
    "RLWE", "LWE",
    "PackedCiphertext", "Ciphertext", "EncryptedBit",
    "PrivateEncryptedCiphertext", "PublicEncryptedCiphertext",
    "PrivateKey", "PublicKey", "BootstrapKey",
    "encrypt", "encrypt_public", "encrypt_optimal", "normalize_ciphertext",
    "decrypt", "decrypt_bit", "split_ciphertext", "deterministic_expand",
    "bootstrap", "bootstrap_batch", "pack_encrypted_bits",
    "Scheme2",
    "circuit", "Circuit", "evaluate_circuit",
    "prewarm",
]
