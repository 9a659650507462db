"""Payload encryption (E4) and meta-attribute operations (D5).

Re-expresses _encryption_helper.py:108-204 + initialization_vector.py:26-33:
PII payloads are AES-CBC encrypted with a keyed cipher; the per-message IV
rides as a meta attribute; `encryption_type` strings look like
'AES_MODE_CBC-<key_id>' and select the key.

Spark-first: `aes_encrypt`/`aes_decrypt` SQL functions (JVM, codegen) in
CBC/PKCS mode with an explicit IV column — no Python in the row path.  Key
management stays driver-side (key id -> 32-byte key), as in the reference's
key files (_encryption_helper.py:136-149).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ENCRYPTION_TYPE_PREFIX = "AES_MODE_CBC"

# Meta-attribute schema id under which the per-message IV rides
# (initialization_vector.py:26-33 registers an IV avsc in the Schematizer;
# this engine reserves a well-known id — swap for the registered id when a
# deployment manages meta-attribute schemas in the registry).
IV_META_SCHEMA_ID = 1_000_000


def encryption_type_str(key_id: int) -> str:
    return f"{ENCRYPTION_TYPE_PREFIX}-{key_id}"


def parse_key_id(encryption_type: Column) -> Column:
    """'AES_MODE_CBC-1' -> 1 (_encryption_helper.py:57-66 parsing)."""
    return F.split(encryption_type, "-").getItem(1).cast("int")


def encrypt_payload(payload: Column, key: bytes, iv: Column | None = None) -> Column:
    """AES-CBC/PKCS encrypt; emits iv||ciphertext.

    With ``iv`` omitted (the default and the secure path) the JVM draws a
    fresh 16-byte IV per row from SecureRandom — a CSPRNG.  Deriving IVs
    from `uuid()` (the pre-r7 shape) is NOT safe: Spark's uuid() is backed
    by a non-cryptographic XORShift PRNG seeded once per partition, and
    UUIDv4 fixes 6 version/variant bits, so those IVs were biased and
    predictable — with CBC that enables chosen-plaintext attacks on the
    encrypted PII payloads (E4).  The per-message IV meta attribute is
    read back off the ciphertext's 16-byte prefix (`iv_of`).

    An explicit ``iv`` column is still accepted for tests / interop with
    externally-supplied IVs.
    """
    args = [payload, F.lit(key), F.lit("CBC"), F.lit("PKCS")]
    if iv is not None:
        args.append(iv)
    return F.aes_encrypt(*args)


def iv_of(ciphertext: Column) -> Column:
    """The IV actually used for a ciphertext: its 16-byte prefix (Spark's
    CBC layout is iv||ct).  Source of the IV meta attribute."""
    return F.substring(ciphertext, 1, 16)


def decrypt_payload(ciphertext: Column, key: bytes, iv: Column | None = None) -> Column:
    """AES-CBC/PKCS decrypt.  Spark's aes_decrypt expects the IV prepended
    to the ciphertext in CBC mode; aes_encrypt already emits iv||ct, so
    decrypt is direct — ``iv`` is accepted for signature parity with the
    reference's decrypt-with-meta-IV shape but unused."""
    return F.aes_decrypt(ciphertext, F.lit(key), F.lit("CBC"), F.lit("PKCS"))


# -- meta attributes (MetaAttribute array on the envelope) -------------------


def meta_attribute(schema_id: int | Column, payload: Column) -> Column:
    sid = F.lit(schema_id) if isinstance(schema_id, int) else schema_id
    return F.struct(sid.alias("schema_id"), payload.alias("payload"))


def add_meta(meta: Column, attr: Column) -> Column:
    """Append an attribute to the (nullable) meta array."""
    return F.when(meta.isNull(), F.array(attr)).otherwise(
        F.concat(meta, F.array(attr))
    )


def pop_meta(meta: Column, schema_id: int) -> Column:
    """Remove attributes with the given schema_id (the swap-pop of
    message.py:536-550, e.g. stripping the IV after decryption)."""
    return F.filter(meta, lambda m: m.schema_id != F.lit(schema_id))


def get_meta(meta: Column, schema_id: int) -> Column:
    """First attribute payload with the given schema_id (IV extraction)."""
    return F.element_at(
        F.filter(meta, lambda m: m.schema_id == F.lit(schema_id)), 1
    ).payload
