#!/usr/bin/env python3
"""Regenerate README.md's benchmark block from a measured bench artifact.

Round-2 lesson (twice): hand-written bench claims drift from the driver's
own artifacts. This script makes the README lines a pure function of a
measurement file, so refreshing them is part of running the bench:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      sbt -batch "runMain graft.Bench" 2>&1 | grep -o '{"sf".*}' > /tmp/bench.json
    python3 tools/bench_report.py /tmp/bench.json

Accepts either a raw one-line bench JSON (what graft.Bench prints) or the
driver's BENCH_r{N}.json wrapper (which embeds that line in its "tail").
Rewrites the region between the BENCH:BEGIN / BENCH:END markers in
README.md (or a path given as the second argument).
"""
import json
import re
import sys


def load_bench(path):
    raw = open(path).read()
    try:
        j = json.loads(raw)
    except json.JSONDecodeError:
        j = None
    if isinstance(j, dict) and "queries" in j:
        return j, path
    # driver wrapper: the bench line is embedded in "tail"
    text = j.get("tail", raw) if isinstance(j, dict) else raw
    m = re.search(r'\{"(?:sf|metric)".*\}', text)
    if m:
        try:
            return json.loads(m.group(0)), path
        except json.JSONDecodeError:
            pass
    # Tail-truncated capture: the contract keys sit at the END of the line
    # precisely so they survive a 2000-char tail window — reconstruct the
    # queries map + total from the surviving suffix.
    mq = re.search(r'"queries":(\{[^{}]*\})', text)
    mv = re.search(r'"metric":"total","value":([0-9.]+)', text)
    if not (mq and mv):
        sys.exit(f"no bench JSON line found in {path}")
    b = {"queries": json.loads(mq.group(1)), "value": float(mv.group(1))}
    msf = re.search(r'"sf":"([^"]*)"', text)
    if msf:
        b["sf"] = msf.group(1)
    # clean-rep certification keys sit just before the contract keys, so
    # they survive the same tail window — recover them too
    mct = re.search(r'"clean_total":([0-9.]+),"clean_coverage":"(\d+)/(\d+)"',
                    text)
    if mct:
        b["clean_total"] = float(mct.group(1))
        b["clean_coverage"] = f"{mct.group(2)}/{mct.group(3)}"
    return b, path


def render(b, src):
    qs = sorted(b["queries"].items(), key=lambda kv: -kv[1])
    n = len(qs)
    times = sorted(v for _, v in qs)
    mid = n // 2
    median = times[mid] if n % 2 else (times[mid - 1] + times[mid]) / 2
    top = ", ".join(f"{k} {v:.1f} s" for k, v in qs[:5])
    sub1 = sum(1 for v in times if v < 1.0)
    env_bits = []
    for key, label in [("reps", "reps"), ("agg", "agg"), ("cpus", "threads"),
                       ("shuffle_partitions", "shuffle partitions"),
                       ("max_partition_bytes", "split size")]:
        if key in b:
            env_bits.append(f"{label}={b[key]}")
    env = ", ".join(env_bits) if env_bits else "see artifact"
    # Generated steal adjudication (round-11 lesson: three consecutive
    # rounds hand-argued host contention in prose; now the artifact
    # carries per-rep steal and this paragraph is derived, not written).
    # Scale: 100 steal ticks/s = one continuously stolen core (USER_HZ).
    adj = ""
    rate = b.get("minrep_steal_per_sec", -1)
    if rate is not None and rate >= 0:
        dirty = b.get("dirty_minreps", {}) or {}
        if rate < 5:
            verdict = "clean — hypervisor steal was negligible while the reported reps ran"
        elif rate < 50:
            verdict = ("lightly contended — treat sub-second per-query deltas "
                       "vs other rounds with caution")
        else:
            verdict = ("CONTENDED — re-run before comparing totals across rounds")
        adj = (f"\nSteal adjudication (generated): the reported min-reps ran at "
               f"{rate:.1f} steal ticks/s\n"
               f"overall (100 ≈ one stolen core): {verdict}.")
        if dirty:
            adj += ("\nDirtiest min-reps (steal ticks/s): "
                    + ", ".join(f"{k} {v:.0f}" for k, v in dirty.items()) + ".")
    # Kernel/I-O adjudication (round-12 lesson: the driver's q159 ran
    # [5.4, 15.4, 9.9] s vs 0.9 s clean with LOW per-rep steal — host
    # SYSTEM ticks exceeded user ticks, i.e. kernel/I-O contention that
    # steal-only sampling cannot see). Calibration: that anomaly run
    # measured whole-run system/user = 1.22; a local run at 1.44 showed
    # +4% inflation concentrated on shuffle-heavy queries — so system
    # ABOVE user is the caution line, 2x user (or real iowait) the flag.
    # Individual saturating STAGES legitimately run kernel-heavier; this
    # sentence adjudicates whole-run min-rep totals only.
    rs = b.get("minrep_sys_per_sec", -1)
    ru = b.get("minrep_user_per_sec", -1)
    rw = b.get("minrep_iowait_per_sec", -1)
    if rs is not None and rs >= 0 and ru is not None and ru >= 0:
        if (rw is not None and rw >= 50) or (ru > 0 and rs > 2 * ru):
            kv = "KERNEL/I-O CONTENDED — re-run before comparing totals across rounds"
        elif (rw is not None and rw >= 5) or (ru > 0 and rs > ru):
            kv = ("kernel-heavy — treat sub-second per-query deltas vs other "
                  "rounds with caution")
        else:
            kv = ("clean — kernel and I/O wait were unremarkable while the "
                  "reported reps ran")
        # A failed /proc/stat iowait read (rw < 0) must not render as a
        # clean "0 iowait" — say it was unreadable and that the verdict
        # above used system/user only.
        io_txt = (f"{rw:.0f} iowait ticks/s" if rw is not None and rw >= 0
                  else "iowait unreadable (adjudicated on system/user only)")
        adj += (f"\nKernel/I-O adjudication (generated): min-reps ran at "
                f"{rs:.0f} system / {ru:.0f} user / {io_txt} "
                f"(host-wide): {kv}.")
    # JVM cpu/wall gauge (round-15 policy): the host-independent number.
    # Per-query process CPU is a constant of the plan, so two artifacts
    # on one tree that disagree on minrep_cpuw disagree on WALL only —
    # the one with the lower ratio is the inflated one, no host model
    # needed. Printed, not thresholded: it is a cross-artifact
    # comparator, not a same-run verdict.
    cpuw = b.get("minrep_cpuw", -1)
    if cpuw is not None and cpuw >= 0:
        adj += (f"\nJVM cpu/wall over the reported min-reps: {cpuw:.2f} "
                f"(compare across artifacts on the same tree — lower ratio "
                f"= inflated walls).")
    # Prefer the certified clean_total when present (round-14 policy:
    # Bench retries dirty min-reps and emits a total whose every
    # contributing rep ran with clean host ticks). Full coverage makes
    # it the headline; partial coverage keeps the raw headline and
    # states what the certified number covers.
    cert = ""
    ct, cc = b.get("clean_total"), b.get("clean_coverage", "")
    cc_parts = cc.split("/") if isinstance(cc, str) and "/" in cc else []
    cc_full = len(cc_parts) == 2 and cc_parts[0] == cc_parts[1]
    if ct is not None and cc_full:
        headline = (f"**total {ct:.1f} s across {n} queries (certified clean "
                    f"reps; raw min-total {b['value']:.1f} s)**")
        cert = ("\nEvery rep contributing to the certified total passed BOTH "
                "certification channels: clean host ticks (steal \u22645% and "
                "iowait \u226425% of the host's busy ticks, system within the "
                "saturation profile or the JVM's own) AND a JVM cpu/wall "
                "within 70% of the query's cross-rep median.")
    else:
        headline = f"**total {b['value']:.1f} s across {n} queries**"
        if ct is not None:
            cert = (f"\nClean-rep certification PARTIAL: clean_total "
                    f"{ct:.1f} s covers {cc} queries; the remainder never "
                    f"produced a clean rep — treat cross-round comparison "
                    f"of the raw total with caution.")
    return (
        f"Measured (source: `{src}`): {headline}\n"
        f"at `{b.get('sf', '?')}` ({env}). Slowest five: {top}.{cert}\n"
        f"Median query {median:.2f} s; {sub1}/{n} queries run sub-second.{adj}\n"
        f"Numbers in this block are generated by `tools/bench_report.py` from a\n"
        f"measured artifact — if they disagree with the latest `BENCH_r{{N}}.json`,\n"
        f"re-run the script, don't hand-edit."
    )


def main():
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench.json"
    readme = sys.argv[2] if len(sys.argv) > 2 else "README.md"
    b, src = load_bench(bench_path)
    body = render(b, src)
    text = open(readme).read()
    begin, end = "<!-- BENCH:BEGIN -->", "<!-- BENCH:END -->"
    if begin not in text or end not in text:
        sys.exit(f"{readme} lacks {begin}/{end} markers")
    new = re.sub(
        re.escape(begin) + r".*?" + re.escape(end),
        begin + "\n" + body + "\n" + end,
        text, flags=re.S)
    open(readme, "w").write(new)
    print(body)


if __name__ == "__main__":
    main()
