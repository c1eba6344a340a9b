"""Minimal protobuf wire-format decoder for pending-txn payloads — S7.

The reference decodes each pending transaction's BYTEA payload with the
generated ``blockchain_txn_pb`` module (src/be_db_pending_txn.erl:211-227):
``blockchain_txn`` is a protobuf ``oneof`` wrapper whose member field
number identifies the transaction type and whose value is the embedded
typed txn message; a decode failure marks the row
``status=failed, failed_reason=decoding_failure``.

The protobuf *wire format* (varint tags, length-delimited submessages) is
public and frozen, so the two values the ETL actually extracts — wrapper
field number → txn type, inner varint field → nonce — need no proto
toolchain: this module is a complete hand-rolled reader for wire types
0/1/2/5. The oneof numbering and per-type nonce field numbers are DATA,
not code — they follow the deployment's .proto revision and are passed in
(defaults cover the fixture contract); the decoder itself is
schema-agnostic.

Everything here is driver-side pure Python executed inside an
Arrow-vectorized pandas UDF (functions/encoding.decode_pending_txn) —
per-batch, never per-row dispatch.
"""

from __future__ import annotations

WIRE_VARINT = 0
WIRE_I64 = 1
WIRE_LEN = 2
WIRE_I32 = 5

# blockchain_txn oneof member number → txn type name. Keyed to the proto
# revision in use; unknown members still decode (type "txn_<n>") so new
# chain txn types degrade to "unknown type", not decode failure — matching
# the reference, where decode only fails on malformed bytes.
DEFAULT_TXN_ONEOF: dict[int, str] = {
    1: "add_gateway_v1",
    2: "assert_location_v1",
    3: "coinbase_v1",
    4: "create_htlc_v1",
    5: "gen_gateway_v1",
    6: "consensus_group_v1",
    7: "oui_v1",
    8: "payment_v1",
    9: "security_coinbase_v1",
    10: "redeem_htlc_v1",
    11: "security_exchange_v1",
    12: "vars_v1",
    13: "rewards_v1",
    14: "token_burn_v1",
    15: "dc_coinbase_v1",
    16: "token_burn_exchange_rate_v1",
    17: "payment_v2",
    18: "state_channel_open_v1",
    19: "state_channel_close_v1",
    20: "price_oracle_v1",
    21: "transfer_hotspot_v1",
    22: "rewards_v2",
    23: "assert_location_v2",
    24: "gen_validator_v1",
    25: "stake_validator_v1",
    26: "transfer_validator_stake_v1",
    27: "unstake_validator_v1",
    28: "validator_heartbeat_v1",
}

# txn type → inner field number carrying the nonce varint (absent types
# have no nonce — decode returns NULL nonce, like the reference's record).
DEFAULT_NONCE_FIELDS: dict[str, int] = {
    "payment_v1": 4,
    "payment_v2": 4,
    "assert_location_v1": 8,
    "assert_location_v2": 7,
    "oui_v1": 6,
    "token_burn_v1": 4,
    "security_exchange_v1": 4,
    "vars_v1": 3,
}


def read_varint(buf: bytes, i: int) -> tuple[int, int]:
    """Base-128 varint at offset ``i`` → (value, next offset). Raises
    ValueError on truncation or a >64-bit varint."""
    result = 0
    shift = 0
    while True:
        if i >= len(buf):
            raise ValueError("truncated varint")
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, i
        shift += 7
        if shift > 63:
            raise ValueError("varint exceeds 64 bits")


def parse_fields(buf: bytes) -> list[tuple[int, int, "int | bytes"]]:
    """One non-recursive pass over a message's wire bytes →
    [(field_number, wire_type, value)]. Length-delimited values come back
    as raw bytes (callers re-parse submessages as needed). Raises
    ValueError on any malformed structure — the decode-failure signal."""
    i, out = 0, []
    n = len(buf)
    while i < n:
        tag, i = read_varint(buf, i)
        field, wt = tag >> 3, tag & 7
        if field == 0:
            raise ValueError("field number 0")
        if wt == WIRE_VARINT:
            v, i = read_varint(buf, i)
        elif wt == WIRE_LEN:
            ln, i = read_varint(buf, i)
            if i + ln > n:
                raise ValueError("truncated length-delimited field")
            v = buf[i : i + ln]
            i += ln
        elif wt == WIRE_I64:
            if i + 8 > n:
                raise ValueError("truncated fixed64")
            v = int.from_bytes(buf[i : i + 8], "little")
            i += 8
        elif wt == WIRE_I32:
            if i + 4 > n:
                raise ValueError("truncated fixed32")
            v = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        else:  # wire types 3/4 (groups) are pre-proto2 legacy
            raise ValueError(f"unsupported wire type {wt}")
        out.append((field, wt, v))
    return out


def decode_txn(
    payload: "bytes | None",
    oneof: "dict[int, str] | None" = None,
    nonce_fields: "dict[str, int] | None" = None,
) -> "tuple[str, int | None] | None":
    """blockchain_txn wrapper bytes → (type, nonce) or None on malformed
    input (→ the status=failed short-circuit). The wrapper must contain
    exactly one length-delimited oneof member, like the generated decoder
    enforces."""
    if payload is None:
        return None
    try:
        fields = parse_fields(bytes(payload))
    except ValueError:
        return None
    members = [(f, v) for f, wt, v in fields if wt == WIRE_LEN]
    if len(members) != 1 or len(members) != len(fields):
        return None
    field, inner_bytes = members[0]
    ttype = (oneof or DEFAULT_TXN_ONEOF).get(field, f"txn_{field}")
    try:
        inner = parse_fields(inner_bytes)
    except ValueError:
        return None
    nf = (nonce_fields or DEFAULT_NONCE_FIELDS).get(ttype)
    nonce = None
    if nf is not None:
        for f2, wt2, v2 in inner:
            if f2 == nf and wt2 == WIRE_VARINT:
                nonce = v2  # last occurrence wins, per proto semantics
    return ttype, nonce


# ---- test/fixture support: the matching minimal encoder ------------------


def encode_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_field(field: int, wt: int, value: "int | bytes") -> bytes:
    tag = encode_varint((field << 3) | wt)
    if wt == WIRE_VARINT:
        return tag + encode_varint(value)
    if wt == WIRE_LEN:
        return tag + encode_varint(len(value)) + bytes(value)
    raise ValueError(f"encoder supports wire types 0/2, not {wt}")
