#!/usr/bin/env python3
"""Regenerate src/test/scala/graft/ByteBudgets.scala from a full
PlanBudgetProbe log (r8 shuffle-byte plan net).

Usage: python3 tools/gen_byte_budgets.py /tmp/probe_full.log

Ceiling rule: observed shuffle write bytes × 2 + 64 KiB — factor-2 slack
for testdata-regen jitter, the 64 KiB floor so near-zero queries aren't
pinned at single-record granularity. Exceptions (deliberately tight
exhibits) are listed in TIGHT and get × 1.5 instead: a regression to a
wider shuffle shape (the class the stage count cannot see) must trip them.
"""
import sys, re

TIGHT = {
    # r7's single-scan rewrite ships ~3.1x less shuffle volume than the
    # 7-join form at cluster scale; 1.5x headroom means the wide form
    # (or any per-fact-row key reshuffle creeping back) fails the gate
    "fk_integrity",
}

def ceil_for(name, obs):
    factor = 1.5 if name in TIGHT else 2.0
    return int(obs * factor) + 65536

def main():
    obs = {}
    for line in open(sys.argv[1]):
        m = re.search(r"BUDGET (\S+) stages=\S+ bnlj=\S+ cart=\S+ shuffleWriteBytes=(\d+)", line)
        if m:
            obs[m.group(1)] = int(m.group(2))
    rows = "\n".join(
        f'    "{n}" -> {ceil_for(n, b)}L, // observed {b}'
        + (" (TIGHT x1.5 exhibit)" if n in TIGHT else "")
        for n, b in sorted(obs.items()))
    out = f"""package graft

/** Per-query shuffle-WRITE-byte ceilings for PlanBudgetSpec's r8 volume
  * net — REGENERATED, do not hand-edit rows: run
  *   sbt 'Test/runMain graft.tools.PlanBudgetProbe /root/testdata/sf0.001' > probe.log
  *   python3 tools/gen_byte_budgets.py probe.log
  * Ceiling = spec-scale observation x 2 + 64 KiB (x 1.5 for the
  * deliberately-tight exhibits, see gen_byte_budgets.py TIGHT): the axis
  * that catches a query keeping its stage COUNT while multiplying the
  * volume it pushes through an exchange — fk_integrity's 7-join vs
  * single-scan forms differ only here.
  */
object ByteBudgets {{
  val table: Map[String, Long] = Map(
{rows}
  )
}}
"""
    with open("src/test/scala/graft/ByteBudgets.scala", "w") as f:
        f.write(out)
    print(f"wrote {len(obs)} byte budgets")

if __name__ == "__main__":
    main()
