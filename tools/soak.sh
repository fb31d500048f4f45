#!/usr/bin/env bash
# INVOCATION-ISOLATED scale soak — the r11 noise post-mortem's fix made
# the default: identical ScaleSoak code drifted 2-3x BETWEEN sbt
# invocations on this box (lingering load, page-cache state, JIT/GC
# history), so published numbers must be min-of-N where each sample
# comes from a FRESH JVM, per family, with nothing else running. This
# wrapper launches graft.tools.ScaleSoak once per (family, invocation)
# via a bare `java` (no sbt locks, no compile races; `sbt compile`
# first), collects the per-run JSON lines, and aggregates min-of-N per
# (query, scale) into the BASELINE.md table, with the measured
# between-invocation spread (max/min) printed per row — the noise
# bound the table's consumers need to judge any later regression.
#
#   tools/soak.sh [base] [mult] [invocations] [fam1,fam2,...]
#
# Defaults: 5000 10 3 <every ScaleSoak family>. Each invocation runs
# reps=2 inside (the intra-JVM min the soak always took); the published
# number is the min ACROSS invocations of those minima.
set -euo pipefail
cd "$(dirname "$0")/.."

BASE="${1:-5000}"
MULT="${2:-10}"
INVOCATIONS="${3:-3}"
FAMILIES="${4:-}"

CP="$(ls /opt/spark/jars/*.jar | tr '\n' ':')target/scala-2.13/classes"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

[ -d target/scala-2.13/classes ] || { echo "run 'sbt compile' first"; exit 1; }

if [ -z "$FAMILIES" ]; then
  # ask the compiled soak for its family list (kept in ONE place)
  FAMILIES="$(java -cp "$CP" graft.tools.ScaleSoak --list)"
fi

OUT="$(mktemp /tmp/graft-soak.XXXXXX.jsonl)"
echo "# invocation-isolated soak: base=$BASE mult=$MULT invocations=$INVOCATIONS" >&2
echo "# families: $FAMILIES" >&2

run_family() { # $1 fam, $2 inv-label, $3 reps, $4 protocol tag
  # shellcheck disable=SC2086
  java $ADD_OPENS -Xmx"${SPARK_DRIVER_MEM:-48g}" \
    -XX:MetaspaceSize=512m -XX:SoftRefLRUPolicyMSPerMB=0 \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.tools.ScaleSoak "$BASE" "$MULT" "$3" "$1" 2>/dev/null \
    | grep '^{' | sed "s/^{/{\"invocation\":$2,\"protocol\":\"$4\",/"
}

IFS=',' read -ra FAMS <<< "$FAMILIES"
for fam in "${FAMS[@]}"; do
  FAMOUT="$(mktemp /tmp/graft-soak-fam.XXXXXX.jsonl)"
  for inv in $(seq 1 "$INVOCATIONS"); do
    echo "== $fam invocation $inv/$INVOCATIONS ==" >&2
    # SOAK_REPS: in-JVM repetitions per (query, scale). Default 1 — in
    # the isolated protocol the min comes from ACROSS invocations;
    # doubling cold reps inside one JVM just doubles the heavy builds.
    run_family "$fam" "$inv" "${SOAK_REPS:-1}" "min1" >> "$FAMOUT"
  done
  # WARM-PUBLICATION PROTOCOL (BASELINE.md §r13, now enforced): a
  # corpus-scale-warm family whose first warm rep reads WORSE than its
  # cold inherits the cold pass's GC/heap state (the r13 dd_incremental
  # anomaly, 290 s warm vs 113 s cold; in-JVM min-of-3 converged to the
  # true 22.6 s). Detect warm > cold at any (query, scale) and rerun
  # the family once with SOAK_REPS=3; the aggregate tags rows whose
  # warm came from the min-of-3 rerun.
  if python3 - "$FAMOUT" <<'PYCHECK'
import json, sys, collections
rows = [json.loads(l) for l in open(sys.argv[1])]
by = collections.defaultdict(list)
for r in rows:
    by[(r["query"], r["n_docs"])].append(r)
bad = any(min(v["warm_secs"] for v in vs) > min(v["cold_secs"] for v in vs)
          for vs in by.values())
sys.exit(0 if bad else 1)
PYCHECK
  then
    echo "== $fam warm>cold detected: min-of-3 protocol rerun ==" >&2
    run_family "$fam" "$((INVOCATIONS + 1))" 3 "min3" >> "$FAMOUT"
  fi
  cat "$FAMOUT" >> "$OUT"
  rm -f "$FAMOUT"
done

python3 - "$OUT" "$MULT" <<'PYEOF'
import json, sys, collections
rows = [json.loads(l) for l in open(sys.argv[1])]
mult = int(sys.argv[2])
by = collections.defaultdict(list)
for r in rows:
    by[(r["query"], r["n_docs"])].append(r)
# preserve first-seen query order
order, seen = [], set()
for r in rows:
    if r["query"] not in seen:
        seen.add(r["query"]); order.append(r["query"])
scales = sorted({k[1] for k in by})
lo, hi = scales[0], scales[-1]
print("\n| query | cold 1x s | cold %dx s | exponent | warm %dx s | jobs 1x/%dx | job-secs %dx | spread 1x/%dx | rows %dx |" % (mult, mult, mult, mult, mult, mult))
print("|---|---|---|---|---|---|---|---|---|")
import math
for q in order:
    a = by[(q, lo)]; b = by[(q, hi)]
    c1 = min(r["cold_secs"] for r in a); cm = min(r["cold_secs"] for r in b)
    s1 = max(r["cold_secs"] for r in a) / c1
    sm = max(r["cold_secs"] for r in b) / cm
    wm = min(r["warm_secs"] for r in b)
    wm_src = min(b, key=lambda r: r["warm_secs"]).get("protocol", "min1")
    jm = min(r["n_jobs"] for r in b); j1 = min(r["n_jobs"] for r in a)
    jsm = min(r["job_secs"] for r in b)
    expo = math.log(cm / c1) / math.log(mult)
    rowsm = b[0]["rows"]
    wcell = ("%.2f (min3)" % wm) if wm_src == "min3" else ("%.2f" % wm)
    print("| %s | %.2f | %.2f | %.2f | %s | %d/%d | %.1f | %.2fx/%.2fx | %d |"
          % (q, c1, cm, expo, wcell, j1, jm, jsm, s1, sm, rowsm))
PYEOF
echo "raw samples: $OUT" >&2
