#!/usr/bin/env python3
"""Hash-replay domain audit (round 10).

Round 9 flagged two domain edges in the DuckDB oracle replays:
  - hashBytesLevels (xxh64 <32-byte chain) correctness at 24-31 bytes;
  - murmurChain behavior on >32-byte tokens (was: error() killing the
    whole oracle query; now: row-scoped NULL).

graft.OracleDomainProbe emits the probe SQL plus the JVM kernels' own
hash values for byte lengths 1..40 and multi-byte UTF-8 tokens. This
tool replays the SQL in DuckDB and asserts:
  1. xxh64 chain == XXH64.hashUnsafeBytes for EVERY length 1..31;
  2. feeding a >=32-byte token to the xxh64 chain raises the NAMED
     out-of-domain error (not a wrong value);
  3. murmur chain h64 == Murmur3_x86_32 (hi<<32|lo) for lengths 1..32;
  4. >32-byte tokens read odd=true, h64=NULL - one bad row can no
     longer kill an oracle query.

Usage: python3 tools/oracle_domain_audit.py [probe.json [out.json]]
(default probe: target/oracle_domain_probe.json; run
 `sbt "runMain graft.OracleDomainProbe"` first.)
"""
import json
import sys

import duckdb

probe_path = sys.argv[1] if len(sys.argv) > 1 else "target/oracle_domain_probe.json"
out_path = sys.argv[2] if len(sys.argv) > 2 else "oracle_domain_audit.json"
probe = json.load(open(probe_path))
tokens = probe["tokens"]

con = duckdb.connect()


def register(rows):
    con.execute("DROP VIEW IF EXISTS probe_tokens")
    con.execute("DROP TABLE IF EXISTS probe_tokens_t")
    con.execute("CREATE TABLE probe_tokens_t (hx VARCHAR)")
    con.executemany("INSERT INTO probe_tokens_t VALUES (?)", [(r,) for r in rows])
    con.execute("CREATE VIEW probe_tokens AS SELECT hx FROM probe_tokens_t")


fails = []
report = {"xxh64": {}, "murmur": {}}

# ---- 1. xxh64 in-domain: every length 1..31 bit-for-bit
short = [t for t in tokens if t["len"] < 32]
register([t["hx"] for t in short])
got = dict(con.execute(probe["sql_xxh64"]).fetchall())
for t in short:
    g = str(got[t["hx"]])
    if g != t["xxh64"]:
        fails.append(f"xxh64 len={t['len']} hx={t['hx']}: sql={g} jvm={t['xxh64']}")
report["xxh64"]["in_domain_checked"] = len(short)
report["xxh64"]["lengths"] = sorted({t["len"] for t in short})

# ---- 2. xxh64 out-of-domain: NAMED error, not a wrong value
long_xx = [t for t in tokens if t["len"] >= 32][:2]
register([t["hx"] for t in long_xx])
try:
    con.execute(probe["sql_xxh64"]).fetchall()
    fails.append("xxh64 >=32-byte input did NOT raise the out-of-domain error")
    report["xxh64"]["oob_named_error"] = False
except Exception as e:
    ok = "out of domain" in str(e)
    report["xxh64"]["oob_named_error"] = ok
    if not ok:
        fails.append(f"xxh64 >=32-byte error is not the NAMED one: {e}")

# ---- 3+4. murmur: all lengths at once - bad rows must NOT kill the query
register([t["hx"] for t in tokens])
rows = con.execute(probe["sql_murmur"]).fetchall()
got_m = {hx: (odd, h64) for hx, odd, h64 in rows}
n_in = n_oob = 0
for t in tokens:
    odd, h64 = got_m[t["hx"]]
    if t["len"] <= 32:
        n_in += 1
        if odd or str(h64) != t["h64"]:
            fails.append(
                f"murmur len={t['len']} hx={t['hx']}: sql=({odd},{h64}) jvm={t['h64']}")
    else:
        n_oob += 1
        if not odd or h64 is not None:
            fails.append(
                f"murmur len={t['len']} hx={t['hx']}: expected row-scoped (odd,NULL), got ({odd},{h64})")
report["murmur"]["in_domain_checked"] = n_in
report["murmur"]["oob_row_scoped_checked"] = n_oob

report["fails"] = fails
report["ok"] = not fails
json.dump(report, open(out_path, "w"), indent=1)
print(json.dumps(report, indent=1))
sys.exit(0 if not fails else 1)
