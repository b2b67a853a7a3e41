"""Pure-Python RSA signature verification for RS256 JWTs.

The reference validates RS256 tokens (utilities/auth.rs uses jsonwebtoken
with an RSA public key); this container has no crypto lib, but RSA
*verification* needs only modular exponentiation with the PUBLIC exponent —
`pow(sig, e, n)` — plus a byte-compare against the deterministic
EMSA-PKCS1-v1_5 encoding of the SHA-256 digest.  No secret material is
handled here, so the usual "never roll your own crypto" side-channel
concerns (constant-time private-key ops, blinding) do not apply to this
path; the comparison result is the public outcome of the check.

Key parsing covers both PEM forms in the wild: SubjectPublicKeyInfo
("BEGIN PUBLIC KEY", RFC 5280) and PKCS#1 ("BEGIN RSA PUBLIC KEY").
"""

from __future__ import annotations

import base64
import hashlib

# DER prefix of the DigestInfo for SHA-256 (RFC 8017 §9.2 note 1).
_SHA256_DIGEST_INFO = bytes.fromhex("3031300d060960864801650304020105000420")

_RSA_OID = bytes.fromhex("2a864886f70d010101")  # 1.2.840.113549.1.1.1


def _der_read(data: bytes, pos: int) -> tuple[int, bytes, int]:
    """Read one TLV at pos -> (tag, value, next_pos)."""
    tag = data[pos]
    length = data[pos + 1]
    pos += 2
    if length & 0x80:
        n_bytes = length & 0x7F
        length = int.from_bytes(data[pos : pos + n_bytes], "big")
        pos += n_bytes
    return tag, data[pos : pos + length], pos + length


def parse_rsa_public_key_pem(pem: str) -> tuple[int, int]:
    """PEM public key -> (n, e)."""
    lines = [
        ln.strip()
        for ln in pem.strip().splitlines()
        if ln.strip() and not ln.startswith("-----")
    ]
    der = base64.b64decode("".join(lines))
    tag, body, _ = _der_read(der, 0)
    if tag != 0x30:
        raise ValueError("not a DER SEQUENCE")
    inner_tag, inner, nxt = _der_read(body, 0)
    if inner_tag == 0x30 and _RSA_OID in inner:
        # SubjectPublicKeyInfo: AlgorithmIdentifier then BIT STRING
        bit_tag, bits, _ = _der_read(body, nxt)
        if bit_tag != 0x03 or bits[0] != 0:
            raise ValueError("malformed SubjectPublicKeyInfo")
        _, body, _ = _der_read(bits, 1)  # RSAPublicKey SEQUENCE
        inner_tag, inner, nxt = _der_read(body, 0)
    # now at PKCS#1 RSAPublicKey: INTEGER n, INTEGER e
    if inner_tag != 0x02:
        raise ValueError("expected INTEGER modulus")
    n = int.from_bytes(inner, "big")
    e_tag, e_bytes, _ = _der_read(body, nxt)
    if e_tag != 0x02:
        raise ValueError("expected INTEGER exponent")
    return n, int.from_bytes(e_bytes, "big")


def rsa_verify_pkcs1_sha256(message: bytes, signature: bytes, n: int, e: int) -> bool:
    """RSASSA-PKCS1-v1_5 verify with SHA-256 (the RS256 primitive)."""
    k = (n.bit_length() + 7) // 8
    if len(signature) != k:
        return False
    em_int = pow(int.from_bytes(signature, "big"), e, n)
    em = em_int.to_bytes(k, "big")
    digest = hashlib.sha256(message).digest()
    t = _SHA256_DIGEST_INFO + digest
    if k < len(t) + 11:
        return False
    expected = b"\x00\x01" + b"\xff" * (k - len(t) - 3) + b"\x00" + t
    return em == expected
