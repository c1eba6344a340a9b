"""Deterministic blockchain-shaped fixture generator (FIXTURES.md §A).

Generates blocks / transactions (typed JSON fields) / accounts history /
oracle_prices etc. with seeded randomness, plus an INDEPENDENT pure-Python
reimplementation of the reference's to_actors rules
(/root/reference/src/be_db_txn_actor.erl:107-453) used as the golden oracle
for the Spark P4 operator — two implementations, one spec.
"""

from __future__ import annotations

import json
import random

N_BLOCKS = 120
N_ACCOUNTS = 40
N_GATEWAYS = 30
N_VALIDATORS = 10

TXN_TYPES = (
    "payment_v2",
    "poc_receipts_v1",
    "poc_receipts_v2",
    "rewards_v1",
    "state_channel_close_v1",
    "add_gateway_v1",
    "assert_location_v2",
    "validator_heartbeat_v1",
    "consensus_group_v1",
    "oui_v1",
    "token_burn_v1",
    "transfer_hotspot_v1",
    "price_oracle_v1",
    "vars_v1",
    "routing_v1",
    "security_exchange_v1",
    "stake_validator_v1",
    "unstake_validator_v1",
    "transfer_validator_stake_v1",
    "subnetwork_rewards_v1",
)


def _addr(rng: random.Random, prefix: str, n: int) -> str:
    return f"{prefix}{rng.randrange(n):04d}"


def gen_transactions(seed: int = 42, n_blocks: int | None = None):
    """Returns (blocks, transactions) as lists of dicts. ``n_blocks``
    overrides the module default (used by bench.py's ingest-throughput
    mode to build a larger corpus than the unit tests need)."""
    rng = random.Random(seed)
    blocks, txns = [], []
    t0 = 1600000000
    for h in range(1, (n_blocks or N_BLOCKS) + 1):
        btime = t0 + h * 60
        n_txn = rng.randrange(1, 6)
        blocks.append(
            {
                "height": h,
                "time": btime,
                "prev_hash": f"bh{h-1:05d}",
                "block_hash": f"bh{h:05d}",
                "transaction_count": n_txn,
                "election_epoch": h // 30,
                "epoch_start": (h // 30) * 30,
            }
        )
        for i in range(n_txn):
            ttype = rng.choice(TXN_TYPES)
            fields: dict = {}
            acct = lambda: _addr(rng, "acc", N_ACCOUNTS)  # noqa: E731
            gw = lambda: _addr(rng, "gw", N_GATEWAYS)  # noqa: E731
            val = lambda: _addr(rng, "val", N_VALIDATORS)  # noqa: E731
            if ttype == "payment_v2":
                fields = {
                    "payer": acct(),
                    "payments": [
                        {"payee": acct(), "amount": rng.randrange(1, 10**6)}
                        for _ in range(rng.randrange(1, 4))
                    ],
                    "fee": rng.randrange(0, 40000),
                    "nonce": rng.randrange(1, 100),
                }
            elif ttype in ("poc_receipts_v1", "poc_receipts_v2"):
                fields = {
                    "challenger": gw(),
                    "path": [
                        {
                            "challengee": gw(),
                            "witnesses": [
                                {"gateway": gw()} for _ in range(rng.randrange(0, 4))
                            ],
                        }
                        for _ in range(rng.randrange(1, 3))
                    ],
                }
            elif ttype == "rewards_v1":
                fields = {
                    "rewards": [
                        {
                            "account": acct(),
                            "gateway": gw() if rng.random() < 0.8 else None,
                            "amount": rng.randrange(1, 10**5),
                            "type": rng.choice(
                                ["poc_challengees", "poc_witnesses", "dc_rewards"]
                            ),
                        }
                        for _ in range(rng.randrange(1, 6))
                    ],
                    "start_epoch": max(1, h - 15),
                    "end_epoch": h,
                }
            elif ttype == "state_channel_close_v1":
                fields = {
                    "closer": acct(),
                    "state_channel": {
                        "owner": acct(),
                        "summaries": [
                            {
                                "client": gw(),
                                "owner": acct(),
                                "num_packets": rng.randrange(1, 1000),
                                "num_dcs": rng.randrange(1, 500),
                                "location": f"8c{rng.randrange(16**6):06x}",
                            }
                            for _ in range(rng.randrange(1, 4))
                        ],
                    },
                }
            elif ttype == "add_gateway_v1":
                fields = {
                    "gateway": gw(),
                    "owner": acct(),
                    "staking_fee": 4000000,
                    "fee": 65000,
                }
                if rng.random() < 0.5:  # payer sometimes absent/empty → owner
                    fields["payer"] = acct() if rng.random() < 0.7 else ""
            elif ttype == "assert_location_v2":
                fields = {
                    "gateway": gw(),
                    "owner": acct(),
                    "payer": acct() if rng.random() < 0.5 else "",
                    "location": f"8c{rng.randrange(16**6):06x}",
                    "staking_fee": 1000000,
                }
            elif ttype == "validator_heartbeat_v1":
                fields = {"address": val(), "height": h, "version": 10}
            elif ttype == "consensus_group_v1":
                fields = {
                    "members": [val() for _ in range(rng.randrange(3, 7))],
                    "proof": "p" * 8,
                    "height": h,
                    "delay": 0,
                }
            elif ttype == "oui_v1":
                fields = {
                    "owner": acct(),
                    "payer": acct(),
                    "oui": rng.randrange(1, 20),
                    "addresses": [acct() for _ in range(rng.randrange(1, 3))],
                    "staking_fee": 10000000,
                    "fee": 30000,
                }
            elif ttype == "token_burn_v1":
                fields = {"payer": acct(), "payee": acct(), "amount": rng.randrange(1, 10**6)}
            elif ttype == "transfer_hotspot_v1":
                fields = {"gateway": gw(), "seller": acct(), "buyer": acct(), "amount_to_seller": rng.randrange(0, 10**6)}
            elif ttype == "price_oracle_v1":
                fields = {"public_key": f"orc{rng.randrange(5)}", "price": rng.randrange(10**8, 2 * 10**8), "block_height": h}
            elif ttype == "vars_v1":
                fields = {"vars": {"poc_version": rng.randrange(1, 12)}, "nonce": rng.randrange(100)}
            elif ttype == "routing_v1":
                # routing actions: only update_routers carries addresses —
                # new_xor/update_xor/request_subnet leave routers unchanged
                # (be_db_oui.erl folds the full ledger entry per block).
                action = rng.choice(
                    ["update_routers", "update_routers", "new_xor", "update_xor", "request_subnet"]
                )
                if action == "update_routers":
                    act = {
                        "action": action,
                        "addresses": [acct() for _ in range(rng.randrange(1, 3))],
                    }
                elif action == "request_subnet":
                    act = {"action": action, "requested_subnet_size": 8}
                else:
                    act = {"action": action, "filter": f"xf{rng.randrange(100):02d}"}
                fields = {
                    "owner": acct(),
                    "oui": rng.randrange(1, 20),
                    "action": act,
                    "fee": rng.randrange(0, 40000),
                    "nonce": rng.randrange(100),
                }
            elif ttype == "security_exchange_v1":
                fields = {"payer": acct(), "payee": acct(), "amount": rng.randrange(1, 10**6)}
            elif ttype == "stake_validator_v1":
                fields = {"validator": val(), "owner": acct(), "stake": 10**10}
            elif ttype == "unstake_validator_v1":
                fields = {"address": val(), "owner": acct(), "stake_amount": 10**10}
            elif ttype == "transfer_validator_stake_v1":
                fields = {
                    "old_validator": val(),
                    "new_validator": val(),
                    "old_owner": acct(),
                    "new_owner": acct() if rng.random() < 0.7 else "",
                    "stake_amount": 10**10,
                }
            elif ttype == "subnetwork_rewards_v1":
                fields = {
                    "rewards": [
                        {"reward_account": acct(), "amount": rng.randrange(1, 10**5)}
                        for _ in range(rng.randrange(1, 4))
                    ],
                    "token_type": "mobile",
                }
            txns.append(
                {
                    "block": h,
                    "hash": f"tx{h:05d}x{i}",
                    "time": btime,
                    "type": ttype,
                    "fields": json.dumps(fields),
                }
            )
    return blocks, txns


def py_to_actors(ttype: str, f: dict) -> list[tuple[str, str]]:
    """Independent golden implementation of to_actors
    (src/be_db_txn_actor.erl:107-453) over the fixture's txn types."""
    out: list[tuple[str, str]] = []
    nz = lambda v: v if v else None  # noqa: E731
    if ttype == "payment_v2":
        out.append(("payer", f["payer"]))
        out += [("payee", p["payee"]) for p in f.get("payments", [])]
    elif ttype in ("poc_receipts_v1", "poc_receipts_v2"):
        for el in f.get("path", []):
            out.append(("challengee", el["challengee"]))
            out += [("witness", w["gateway"]) for w in el.get("witnesses", [])]
        out.append(("challenger", f["challenger"]))
        if ttype == "poc_receipts_v2":
            out.append(("validator", f["challenger"]))
    elif ttype == "rewards_v1":
        for r in f.get("rewards", []):
            out.append(("payee", r["account"]))
            if r.get("gateway"):
                out.append(("reward_gateway", r["gateway"]))
    elif ttype == "state_channel_close_v1":
        out += [
            ("sc_closer", f["closer"]),
            ("payee", f["closer"]),
            ("owner", f["state_channel"]["owner"]),
        ]
        out += [
            ("packet_receiver", s["client"])
            for s in f["state_channel"].get("summaries", [])
        ]
    elif ttype == "add_gateway_v1":
        out += [("gateway", f["gateway"]), ("owner", f["owner"])]
        out.append(("payer", nz(f.get("payer")) or f["owner"]))
    elif ttype == "assert_location_v2":
        out += [("gateway", f["gateway"]), ("owner", f["owner"])]
        out.append(("payer", nz(f.get("payer")) or f["owner"]))
    elif ttype == "validator_heartbeat_v1":
        out.append(("validator", f["address"]))
    elif ttype == "consensus_group_v1":
        out += [("consensus_member", m) for m in f.get("members", [])]
    elif ttype == "oui_v1":
        out += [("owner", f["owner"]), ("payer", f["payer"])]
        out += [("router", a) for a in f.get("addresses", [])]
    elif ttype == "token_burn_v1":
        out += [("payer", f["payer"]), ("payee", f["payee"])]
    elif ttype == "transfer_hotspot_v1":
        out += [
            ("gateway", f["gateway"]),
            ("payee", f["seller"]),
            ("payer", f["buyer"]),
            ("owner", f["buyer"]),
        ]
    elif ttype == "price_oracle_v1":
        out.append(("oracle", f["public_key"]))
    elif ttype == "vars_v1":
        pass
    elif ttype == "routing_v1":
        out += [("owner", f["owner"]), ("payer", f["owner"])]
        out += [("router", a) for a in f.get("action", {}).get("addresses", [])]
    elif ttype == "security_exchange_v1":
        out += [("payer", f["payer"]), ("payee", f["payee"])]
    elif ttype == "stake_validator_v1":
        out += [
            ("validator", f["validator"]),
            ("payer", f["owner"]),
            ("owner", f["owner"]),
        ]
    elif ttype == "unstake_validator_v1":
        out += [
            ("validator", f["address"]),
            ("payee", f["owner"]),
            ("owner", f["owner"]),
        ]
    elif ttype == "transfer_validator_stake_v1":
        out += [
            ("validator", f["old_validator"]),
            ("validator", f["new_validator"]),
            ("payer", nz(f.get("new_owner")) or ""),
            ("payee", f["old_owner"]),
            ("owner", nz(f.get("new_owner")) or f["old_owner"]),
            ("owner", f["old_owner"]),
        ]
        out = [(r, a) for r, a in out if a]
    elif ttype == "subnetwork_rewards_v1":
        out += [("payee", r["reward_account"]) for r in f.get("rewards", [])]
    return sorted(set(out))


def gen_account_history(seed: int = 43):
    """accounts history rows: each account appears in several blocks with
    monotone nonces (FIXTURES.md §A accounts)."""
    rng = random.Random(seed)
    rows = []
    for a in range(N_ACCOUNTS):
        addr = f"acc{a:04d}"
        heights = sorted(rng.sample(range(1, N_BLOCKS + 1), rng.randrange(3, 15)))
        bal = rng.randrange(0, 10**9)
        for i, h in enumerate(heights):
            bal = max(0, bal + rng.randrange(-(10**6), 10**6))
            rows.append(
                {
                    "block": h,
                    "address": addr,
                    "dc_balance": rng.randrange(0, 10**6),
                    "dc_nonce": i,
                    "security_balance": 0,
                    "security_nonce": 0,
                    "balance": bal,
                    "staked_balance": 0,
                    "mobile_balance": 0,
                    "iot_balance": 0,
                    "nonce": i,
                }
            )
    return rows


def gen_oracle_prices(seed: int = 44):
    rng = random.Random(seed)
    rows, price = [], 10**8
    for h in range(1, N_BLOCKS + 1, 7):
        price = max(10**7, price + rng.randrange(-(10**7), 10**7))
        rows.append({"block": h, "price": price})
    return rows
