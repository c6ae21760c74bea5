"""F8 (DES/base64 config secrets, util.cc:27-141) + F9 ini-dialect loader
(config.cc:27-161) — pure driver-side code, no Spark session needed."""

import pytest
from hypothesis import given
from hypothesis import strategies as st

from binlogsub_spark.config import load_ini
from binlogsub_spark.secrets import (
    REFERENCE_KEY,
    base64_decode_permissive,
    decode_password,
    des_ecb_decrypt,
    des_ecb_encrypt,
)


def test_des_fips_known_answer():
    # The published FIPS 46 worked example (key 133457799BBCDFF1,
    # plaintext 0123456789ABCDEF -> 85E813540F0AB405).
    key = bytes.fromhex("133457799BBCDFF1")
    pt = bytes.fromhex("0123456789ABCDEF")
    ct = bytes.fromhex("85E813540F0AB405")
    assert des_ecb_encrypt(pt, key, pad=False) == ct
    assert des_ecb_decrypt(ct, key, unpad=False) == pt


def test_des_weak_key_vector():
    # NBS/NIST single-block vector: all-ones parity key, IP-test plaintext.
    key = bytes.fromhex("0101010101010101")
    pt = bytes.fromhex("8000000000000000")
    assert des_ecb_encrypt(pt, key, pad=False) == bytes.fromhex(
        "95F8A5E5DD31D900"
    )


def test_pkcs7_round_trip_and_bad_padding():
    for n in range(0, 20):  # covers every pad length incl. full block
        msg = bytes(range(n))
        ct = des_ecb_encrypt(msg, b"WorkECJol")
        assert len(ct) % 8 == 0 and len(ct) >= len(msg) + 1
        assert des_ecb_decrypt(ct, b"WorkECJol") == msg
    with pytest.raises(ValueError):
        des_ecb_decrypt(b"\x00" * 8, b"WorkECJol")  # padding byte 0 invalid


def test_evp_key_truncation_to_8_bytes():
    # EVP_des_ecb key length is 8: "WorkECJol" and "WorkECJo" are the same
    # key, which is exactly why the reference's 9-char literal works.
    ct = des_ecb_encrypt(b"secret", b"WorkECJol")
    assert des_ecb_decrypt(ct, b"WorkECJo") == b"secret"
    assert REFERENCE_KEY == b"WorkECJol"


def test_base64_permissive_skips_junk():
    import base64

    raw = b"ec-password!"
    clean = base64.b64encode(raw).decode()
    assert base64_decode_permissive(clean) == raw
    # '=' padding, whitespace and junk chars are skipped, not errors
    noisy = " ".join(clean) + "\n==**"
    assert base64_decode_permissive(noisy) == raw


@given(st.binary(min_size=0, max_size=64), st.binary(min_size=1, max_size=16))
def test_des_round_trips_any_payload(msg, key):
    assert des_ecb_decrypt(des_ecb_encrypt(msg, key), key) == msg


def test_decode_password_end_to_end():
    import base64

    stored = base64.b64encode(
        des_ecb_encrypt("ecEC!)@(#*$*".encode(), REFERENCE_KEY)
    ).decode()
    assert decode_password(stored) == "ecEC!)@(#*$*"


REFERENCE_INI = """\
[mysql]
mysql_ip = 192.168.1.150
mysql_port = 3306
username = ec
password_need_decode = 0
password = ecEC!)@(#*$*
mysql_serverid = 1111

[redis]
redis_ip = 192.168.1.118
redis_port = 20000
needpasswd = 1
password =

[schema]
database = ^test$
table = ^transcripts$
[schema_column_1]
column_index = 0
column_name = conv_id
[schema_column_2]
column_index = 1
column_name = turn_idx
"""


def test_load_ini_reference_dialect(tmp_path):
    p = tmp_path / "binlogsub.ini"
    p.write_text(REFERENCE_INI)
    cfg = load_ini(str(p))
    assert cfg.mysql.host == "192.168.1.150"
    assert cfg.mysql.port == 3306 and cfg.mysql.server_id == 1111
    assert cfg.mysql.username == "ec"
    # password_need_decode = 0 -> stored plaintext passes through
    assert cfg.mysql.password == "ecEC!)@(#*$*"
    assert len(cfg.scopes) == 1
    scope = cfg.scopes[0]
    assert scope.db_regex == "^test$" and scope.table_regex == "^transcripts$"
    # Trim semantics: the trailing space in "conv_id " is deleted
    assert scope.column_names == ["conv_id", "turn_idx"]
    assert cfg.engine.scope is scope
    assert cfg.raw["redis"]["redis_port"] == "20000"


def test_load_ini_decodes_des_password(tmp_path):
    import base64

    stored = base64.b64encode(
        des_ecb_encrypt(b"s3cret-pw", REFERENCE_KEY)
    ).decode()
    p = tmp_path / "enc.ini"
    p.write_text(
        "[mysql]\n"
        "username = ec\n"
        "password_need_decode = 1\n"
        f"password = {stored}\n"
        "[schema]\n"
        "database = ^d$\n"
        "table = ^t$\n"
    )
    cfg = load_ini(str(p))
    assert cfg.mysql.password == "s3cret-pw"
    # default column map applies when the ini names none
    assert cfg.scopes[0].column_names[0] == "conv_id"
