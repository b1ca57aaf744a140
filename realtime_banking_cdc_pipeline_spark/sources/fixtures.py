"""Deterministic banking CDC fixture generator (FIXTURES.md §2).

Produces Debezium-envelope JSON events for customers/accounts/
transactions with the reference generator's distributions
(``data-generator/fake_generator.py:61-104``: ~2 accounts/customer,
txn_type uniform over {DEPOSIT, WITHDRAWAL, TRANSFER},
related_account_id only for transfers, amounts in (1, 1000] 2dp,
status COMPLETED) and the edge cases the README's test suite names
(readme.md:272): multi-updates per key, equal-``created_at`` tiebreaks,
deletes, redelivered duplicates, out-of-order events, null nullable
fields, check-col vs no-op updates.

Pure-Python + seeded RNG so goldens are stable; emitted as Kafka-framed
rows (topic/key/value/ts) that both the batch and streaming paths read.
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass, field

BASE_MS = 1704067200000  # 2024-01-01T00:00:00Z
TOPIC_PREFIX = "banking_server.public"  # generate_and_post_connector.py:23


@dataclass
class FixtureEvent:
    topic: str
    key: str
    value: str  # envelope JSON
    ts_ms: int


@dataclass
class BankingFixture:
    events: list[FixtureEvent] = field(default_factory=list)
    # expected latest row image per table/pk (deletes removed) — the
    # golden for dedup-latest / SCD2 current rows
    expected_current: dict[str, dict[int, dict]] = field(
        default_factory=lambda: {"customers": {}, "accounts": {}, "transactions": {}}
    )
    # number of SCD2 versions a correct `check`-strategy history holds
    expected_versions: dict[str, dict[int, int]] = field(
        default_factory=lambda: {"customers": {}, "accounts": {}}
    )


def _envelope(table: str, before: dict | None, after: dict | None, op: str,
              ts_ms: int, lsn: int) -> str:
    return json.dumps(
        {
            "payload": {
                "before": before,
                "after": after,
                "op": op,
                "ts_ms": ts_ms,
                "source": {"table": table, "lsn": lsn},
            }
        }
    )


def generate(
    n_customers: int = 40,
    seed: int = 42,
    include_deletes: bool = True,
    redeliver_every: int = 7,
) -> BankingFixture:
    rng = random.Random(seed)
    fx = BankingFixture()
    lsn = 0
    ts = BASE_MS

    def emit(table: str, before, after, op, ts_ms, *, track=True):
        nonlocal lsn
        lsn += 1
        pk = (after or before)["id"]
        ev = FixtureEvent(
            topic=f"{TOPIC_PREFIX}.{table}",
            key=json.dumps({"id": pk}),
            value=_envelope(table, before, after, op, ts_ms, lsn),
            ts_ms=ts_ms,
        )
        fx.events.append(ev)
        if track:
            cur = fx.expected_current[table]
            if op == "d":
                cur.pop(pk, None)
            else:
                cur[pk] = dict(after)
        # redelivered duplicate (at-least-once): same payload, same lsn —
        # must be absorbed by dedup/merge idempotency
        if redeliver_every and lsn % redeliver_every == 0:
            fx.events.append(ev)

    account_ids: list[int] = []
    txn_id = 0

    for cid in range(1, n_customers + 1):
        created = ts + cid * 1000
        cust = {
            "id": cid,
            "first_name": f"fn{cid}",
            "last_name": f"ln{cid}",
            "email": f"user{cid}@example.com",
            "created_at": created * 1000,  # Debezium epoch-micros
        }
        emit("customers", None, cust, "c", created)
        fx.expected_versions["customers"][cid] = 1

        # ~2 accounts per customer (fake_generator.py:17)
        for a in range(2):
            aid = cid * 10 + a
            account_ids.append(aid)
            acct = {
                "id": aid,
                "customer_id": cid,
                "account_type": rng.choice(["SAVINGS", "CHECKING"]),
                "balance": round(rng.uniform(10.0, 1000.0), 2),
                "currency": "USD",
                "created_at": (created + 10) * 1000,
            }
            emit("accounts", None, acct, "c", created + 10)
            fx.expected_versions["accounts"][aid] = 1

        # email update (check-col change → new SCD2 version)
        if cid % 3 == 0:
            upd = dict(cust, email=f"user{cid}+new@example.com")
            emit("customers", cust, upd, "u", created + 5000)
            fx.expected_versions["customers"][cid] += 1
            # no-op update: same check-cols, fresh event (NO new version)
            emit("customers", upd, dict(upd), "u", created + 6000)
            # equal-created_at, later ts_ms: tiebreak determinism case
            upd2 = dict(upd, first_name=f"fn{cid}x")
            emit("customers", upd, upd2, "u", created + 6000)
            fx.expected_versions["customers"][cid] += 1

        if include_deletes and cid % 10 == 0:
            emit("customers", fx.expected_current["customers"][cid], None, "d",
                 created + 9000)

    # transactions over all accounts, some out-of-order in ts
    for i in range(n_customers * 10):
        txn_id += 1
        aid = rng.choice(account_ids)
        tt = rng.choice(["DEPOSIT", "WITHDRAWAL", "TRANSFER"])
        related = None
        if tt == "TRANSFER":
            related = rng.choice([x for x in account_ids if x != aid])
        t_created = ts + 100_000 + i * 500
        if i % 11 == 0:  # out-of-order arrival: event ts earlier than prior
            t_created -= 40_000
        txn = {
            "id": txn_id,
            "account_id": aid,
            "txn_type": tt,
            "amount": round(rng.uniform(1.01, 1000.0), 2),
            "related_account_id": related,
            "status": "COMPLETED",
            "created_at": t_created * 1000,
        }
        emit("transactions", None, txn, "c", t_created)

    # balance updates → accounts SCD2 versions
    for aid in account_ids[:: 5]:
        cur = fx.expected_current["accounts"].get(aid)
        if cur is None:
            continue
        upd = dict(cur, balance=round(cur["balance"] + 50.0, 2))
        emit("accounts", cur, upd, "u", ts + 500_000 + aid)
        fx.expected_versions["accounts"][aid] += 1

    return fx


def to_kafka_rows(fx: BankingFixture) -> list[tuple[str, str, str, int]]:
    """Rows matching schemas.KAFKA_FIXTURE_SCHEMA (ts as epoch-ms long;
    callers convert)."""
    return [(e.topic, e.key, e.value, e.ts_ms) for e in fx.events]


def write_fixture_json(fx: BankingFixture, out_dir: str, partitions: int = 4) -> None:
    """Write Kafka-framed events as JSONL shards (streaming file source
    input). Shards split round-robin to exercise multi-file reads."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    shards: list[list[str]] = [[] for _ in range(partitions)]
    for i, e in enumerate(fx.events):
        shards[i % partitions].append(
            json.dumps({"topic": e.topic, "key": e.key, "value": e.value, "ts": e.ts_ms})
        )
    for p, lines in enumerate(shards):
        with open(os.path.join(out_dir, f"part-{p:04d}.jsonl"), "w") as f:
            f.write("\n".join(lines))
