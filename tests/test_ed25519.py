"""ed25519 vs RFC 8032 test vectors + sign/verify round-trip."""

from vectorx_tpu.curves import ed25519 as ed


def test_rfc8032_vector_1():
    # RFC 8032 §7.1 TEST 1 (empty message)
    sk = bytes.fromhex(
        "9d61b19deffd5a60ba844af492ec2cc44449c5697b326919703bac031cae7f60")
    pk_exp = bytes.fromhex(
        "d75a980182b10ab7d54bfed3c964073a0ee172f3daa62325af021a68f707511a")
    sig_exp = bytes.fromhex(
        "e5564300c360ac729086e2cc806e828a84877f1eb8e5d974d873e06522490155"
        "5fb8821590a33bacc61e39701cf9b46bd25bf5f0595bbe24655141438e7a100b")
    assert ed.public_key(sk) == pk_exp
    assert ed.sign(sk, b"") == sig_exp
    assert ed.verify(pk_exp, b"", sig_exp)


def test_rfc8032_vector_2():
    # RFC 8032 §7.1 TEST 2 (1-byte message 0x72)
    sk = bytes.fromhex(
        "4ccd089b28ff96da9db6c346ec114e0f5b8a319f35aba624da8cf6ed4fb8a6fb")
    pk_exp = bytes.fromhex(
        "3d4017c3e843895a92b70aa74d1b7ebc9c982ccf2ec4968cc0cd55f12af4660c")
    sig_exp = bytes.fromhex(
        "92a009a9f0d4cab8720e820b5f642540a2b27b5416503f8fb3762223ebdb69da"
        "085ac1e43e15996e458f3613d0f11d8c387b2eaeb4302aeeb00d291612bb0c00")
    assert ed.public_key(sk) == pk_exp
    assert ed.sign(sk, bytes([0x72])) == sig_exp
    assert ed.verify(pk_exp, bytes([0x72]), sig_exp)


def test_sign_verify_roundtrip_and_rejections():
    sk = bytes(range(32))
    pk = ed.public_key(sk)
    msg = b"GRANDPA precommit" * 3
    sig = ed.sign(sk, msg)
    assert ed.verify(pk, msg, sig)
    assert not ed.verify(pk, msg + b"x", sig)
    bad = bytearray(sig)
    bad[0] ^= 1
    assert not ed.verify(pk, msg, bytes(bad))
    other_pk = ed.public_key(bytes(range(1, 33)))
    assert not ed.verify(other_pk, msg, sig)


def test_decompress_rejects_invalid():
    assert ed.point_decompress(b"\xff" * 32) is None
    # round-trip a valid point
    pk = ed.public_key(bytes(32))
    p = ed.point_decompress(pk)
    assert p is not None
    assert ed.point_compress(p) == pk
