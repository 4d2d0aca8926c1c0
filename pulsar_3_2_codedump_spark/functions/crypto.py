"""End-to-end message encryption (SURVEY §1.2 envelope extension).

Reference: pulsar-client-messagecrypto-bc/src/main/java/org/apache/pulsar/
client/impl/crypto/MessageCryptoBc.java — the producer generates a symmetric
data key, encrypts each payload with AES-GCM under that key (fresh IV per
message, carried as ``encryption_param``), and wraps the data key once per
configured consumer key (``encryption_keys`` map: key-name → wrapped key).
Consumers resolve a private key through CryptoKeyReader
(pulsar-client-api/.../api/CryptoKeyReader.java), unwrap the data key and
decrypt; on failure the ConsumerCryptoFailureAction
(pulsar-client-api/.../api/ConsumerCryptoFailureAction.java) decides FAIL
(hold the message) or CONSUME (deliver the ciphertext as-is).

Spark re-expression: two Arrow ``mapInPandas`` kernels over the envelope —
encrypt-at-append adds ``encryption_keys MAP<STRING,BINARY>`` +
``encryption_param BINARY`` columns and replaces ``value`` with ciphertext;
decrypt-at-scan inverts it. Payloads are AES-GCM; the data-key wrap supports
BOTH the reference's asymmetric scheme (RSA-OAEP under the consumer's
public key — producers hold public PEMs, consumers private PEMs, exactly
MessageCryptoBc's key flow) and a symmetric AES-GCM master-key wrap for
deployments without a PKI. The data key rotates per Arrow batch (the
reference rotates on a timer, MessageCryptoBc data-key refresh) — every
batch's rows share one wrapped-key map, every row gets a fresh 96-bit IV.

Scale posture: both kernels are scan-local (zero shuffle); AES-GCM via
OpenSSL streams at GB/s per core, so encryption rides the same Arrow batch
path as the multimodal/PQ kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.queries import query


class MessageCryptoUnavailable(RuntimeError):
    pass


def _aesgcm():
    try:
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM
    except ImportError as e:  # pragma: no cover - cryptography is baked in
        raise MessageCryptoUnavailable(
            "python-cryptography with AES-GCM is required for message crypto"
        ) from e
    return AESGCM


class CryptoKeyReader:
    """pulsar-client-api CryptoKeyReader: resolves key-name → key material.
    The producer side fetches wrap keys (getPublicKey), the consumer side
    fetches unwrap keys (getPrivateKey). Two key-material forms:

    - RSA PEM (``-----BEGIN ...``): the reference's actual scheme
      (MessageCryptoBc wraps the data key with the consumer's RSA public
      key, RSA-OAEP here) — producers hold PUBLIC pems, consumers PRIVATE.
    - raw 16/24/32-byte AES master key: the symmetric shortcut (same key
      on both sides, AES-GCM key wrap) for deployments without a PKI.
    """

    def __init__(self, keys: dict[str, bytes]):
        for name, k in keys.items():
            if not _is_pem(k) and len(k) not in (16, 24, 32):
                raise ValueError(
                    f"key {name!r}: expected an RSA PEM or a 16/24/32-byte AES key"
                )
        self._keys = dict(keys)

    def get_key(self, name: str) -> bytes | None:
        return self._keys.get(name)

    def names(self) -> list[str]:
        return sorted(self._keys)


def _is_pem(k: bytes) -> bool:
    return isinstance(k, (bytes, bytearray)) and bytes(k).startswith(b"-----BEGIN")


def generate_rsa_keypair(bits: int = 2048) -> tuple[bytes, bytes]:
    """(public_pem, private_pem) — the CryptoKeyReader material for the
    reference's asymmetric wrap (consumer registers the public key with
    producers, keeps the private key)."""
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import rsa

    priv = rsa.generate_private_key(public_exponent=65537, key_size=bits)
    pub_pem = priv.public_key().public_bytes(
        serialization.Encoding.PEM, serialization.PublicFormat.SubjectPublicKeyInfo
    )
    priv_pem = priv.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    )
    return pub_pem, priv_pem


_WRAP_AAD = b"pulsarlike-datakey-v1"  # binds wrapped blobs to this protocol


def encrypt_at_append(
    df: DataFrame,
    key_names: list[str],
    reader: CryptoKeyReader,
    value_col: str = "value",
) -> DataFrame:
    """Producer-side encryption (MessageCryptoBc.encrypt): per Arrow batch,
    generate a fresh 128-bit data key, wrap it under every requested key
    name (12-byte nonce + AES-GCM ciphertext, AAD-bound), then AES-GCM each
    row's payload with a fresh 96-bit IV. Adds ``encryption_keys`` and
    ``encryption_param``; ``value`` becomes ciphertext (includes the GCM
    tag). Rows with NULL payload stay NULL (null_value messages are not
    encrypted — PulsarApi.proto null_value)."""
    AESGCM = _aesgcm()
    missing = [n for n in key_names if reader.get_key(n) is None]
    if missing:
        raise KeyError(f"CryptoKeyReader has no key for {missing}")
    wrap_keys = {n: reader.get_key(n) for n in key_names}
    in_cols = df.columns
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in in_cols]
        + [
            "encryption_keys map<string,binary>",
            "encryption_param binary",
        ]
    )

    def kernel(batches):
        import os as _os

        # imports inside the task: capturing the Rust-backed classes in the
        # closure makes PySpark's pickler ship methodless stubs
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import padding
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM

        oaep = padding.OAEP(
            mgf=padding.MGF1(algorithm=hashes.SHA256()),
            algorithm=hashes.SHA256(),
            label=_WRAP_AAD,
        )
        for pdf in batches:
            data_key = AESGCM.generate_key(bit_length=128)
            wrapped = {}
            for name, master in wrap_keys.items():
                if _is_pem(master):  # reference scheme: RSA public-key wrap
                    pub = serialization.load_pem_public_key(bytes(master))
                    wrapped[name] = pub.encrypt(data_key, oaep)
                else:  # symmetric master-key wrap (no-PKI shortcut)
                    nonce = _os.urandom(12)
                    wrapped[name] = nonce + AESGCM(master).encrypt(
                        nonce, data_key, _WRAP_AAD
                    )
            gcm = AESGCM(data_key)
            ivs, cts = [], []
            for v in pdf[value_col]:
                if v is None:
                    ivs.append(None)
                    cts.append(None)
                    continue
                iv = _os.urandom(12)
                ivs.append(iv)
                cts.append(gcm.encrypt(iv, bytes(v), None))
            out = pdf.copy()
            out[value_col] = cts
            out["encryption_keys"] = [wrapped] * len(pdf)
            out["encryption_param"] = ivs
            yield out

    return df.mapInPandas(kernel, out_schema)


def decrypt_at_scan(
    df: DataFrame,
    reader: CryptoKeyReader,
    value_col: str = "value",
    failure_action: str = "FAIL",
) -> DataFrame:
    """Consumer-side decryption (MessageCryptoBc.decrypt): per row, find the
    first entry of ``encryption_keys`` the reader can unwrap, then AES-GCM
    decrypt the payload with ``encryption_param`` as IV. Adds a
    ``decrypt_ok`` boolean; on failure (no known key / tampered ciphertext)
    ConsumerCryptoFailureAction semantics apply: FAIL drops the row from
    the decrypted stream (held back, as the reference consumer stalls it),
    CONSUME delivers the ciphertext unchanged with decrypt_ok = false AND
    keeps its ``encryption_keys``/``encryption_param`` so a later holder of
    the key can still recover it (the reference consumer delivers the raw
    message with metadata intact). Rows with NULL/empty ``encryption_keys``
    are unencrypted messages (the envelope documents the column as NULL on
    plaintext appends; MessageCryptoBc only decrypts when
    ``getEncryptionKeysCount() > 0``) and pass through unchanged with
    decrypt_ok = true — a mixed/legacy topic scan must not lose them."""
    if failure_action not in ("FAIL", "CONSUME"):
        raise ValueError("failure_action must be FAIL or CONSUME")
    AESGCM = _aesgcm()
    known = {n: reader.get_key(n) for n in reader.names()}
    in_cols = df.columns
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in in_cols]
        + ["decrypt_ok boolean"]
    )

    def kernel(batches):
        from cryptography.exceptions import InvalidTag
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import padding
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM

        oaep = padding.OAEP(
            mgf=padding.MGF1(algorithm=hashes.SHA256()),
            algorithm=hashes.SHA256(),
            label=_WRAP_AAD,
        )
        priv_cache: dict[str, object] = {}

        def unwrap(name, master, wb):
            if _is_pem(master):
                priv = priv_cache.get(name)
                if priv is None:
                    priv = serialization.load_pem_private_key(bytes(master), None)
                    priv_cache[name] = priv
                return priv.decrypt(wb, oaep)  # ValueError on wrong key
            return AESGCM(master).decrypt(wb[:12], wb[12:], _WRAP_AAD)

        for pdf in batches:
            vals, oks = [], []
            key_cache: dict[bytes, bytes] = {}
            for v, ekeys, iv in zip(
                pdf[value_col], pdf["encryption_keys"], pdf["encryption_param"]
            ):
                if v is None:
                    vals.append(None)
                    oks.append(True)
                    continue
                # Arrow MapType round-trips as dict or as [(k, v), ...]
                # depending on the conversion path — accept both
                pairs = list(
                    ekeys.items() if hasattr(ekeys, "items") else (ekeys or [])
                )
                if not pairs:  # unencrypted message: deliver untouched
                    vals.append(bytes(v))
                    oks.append(True)
                    continue
                plain = None
                for name, wrapped in pairs:
                    master = known.get(name)
                    if master is None:
                        continue
                    wb = bytes(wrapped)
                    data_key = key_cache.get(wb)
                    if data_key is None:
                        try:
                            data_key = unwrap(name, master, wb)
                        except (InvalidTag, ValueError):
                            continue
                        key_cache[wb] = data_key
                    try:
                        plain = AESGCM(data_key).decrypt(bytes(iv), bytes(v), None)
                        break
                    except InvalidTag:
                        continue
                if plain is None:
                    vals.append(bytes(v))
                    oks.append(False)
                else:
                    vals.append(plain)
                    oks.append(True)
            out = pdf.copy()
            out[value_col] = vals
            out["decrypt_ok"] = oks
            yield out

    dec = df.mapInPandas(kernel, out_schema)
    if failure_action == "FAIL":
        return dec.filter(F.col("decrypt_ok")).drop(
            "encryption_keys", "encryption_param"
        )
    # CONSUME: undecrypted rows keep their wrapped data key + IV (the
    # reference delivers the raw message with its metadata intact);
    # decrypted rows shed them like the FAIL path does
    return dec.withColumns(
        {
            "encryption_keys": F.when(
                ~F.col("decrypt_ok"), F.col("encryption_keys")
            ),
            "encryption_param": F.when(
                ~F.col("decrypt_ok"), F.col("encryption_param")
            ),
        }
    )


ENC_DOCS = 200  # doc_id < ENC_DOCS feed the encrypted topic
_ENC_KEYS = {"enc-a": bytes(range(16)), "enc-b": bytes(range(16, 48))}


@query(
    "encrypted_roundtrip",
    section="2.A-crypto",
    doc="End-to-end message encryption round trip (MessageCryptoBc.java "
    "encrypt/decrypt; CryptoKeyReader.java): document payloads AES-GCM "
    "encrypted at append under a per-batch data key wrapped for two key "
    "names, then decrypted at scan by a consumer holding ONE of the two "
    "keys. Output proves the round trip byte-exact — decrypted length + "
    "md5 must equal the original's (the oracle computes both from the "
    "ORIGINAL text, so any cipher/envelope defect hash-mismatches) — and "
    "that every row decrypted (decrypt_ok count). Both kernels are "
    "scan-local Arrow passes; nothing shuffles.",
    oracle=f"""
        SELECT doc_id,
               CAST(LENGTH(text) AS BIGINT) AS payload_len,
               md5(text) AS payload_md5,
               1 AS decrypt_ok
        FROM documents WHERE doc_id < {ENC_DOCS}
    """,
)
def encrypted_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < ENC_DOCS)
        .select(
            "doc_id", F.to_binary(F.col("text"), F.lit("utf-8")).alias("value")
        )
    )
    producer_reader = CryptoKeyReader(_ENC_KEYS)
    consumer_reader = CryptoKeyReader({"enc-b": _ENC_KEYS["enc-b"]})
    enc = encrypt_at_append(docs, ["enc-a", "enc-b"], producer_reader)
    dec = decrypt_at_scan(enc, consumer_reader, failure_action="FAIL")
    payload = F.col("value").cast("string")
    return dec.select(
        "doc_id",
        F.length(payload).cast("long").alias("payload_len"),
        F.md5(payload).alias("payload_md5"),
        F.col("decrypt_ok").cast("int").alias("decrypt_ok"),
    )
