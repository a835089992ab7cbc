#!/usr/bin/env python
"""Aggregate results/r5/eval_*.json into the round-5 RESULTS tables.

Every number printed here is derived from a COMMITTED per-cell artifact
(VERDICT r4 #2): the cross-pipeline grand table, the per-noise flagship
breakdown, and the seed mean±std table for the PA v4-vs-v5 decision.
Run: python scripts/r5_table.py            # print to stdout
     python scripts/r5_table.py --write    # splice into RESULTS.md between
                                           # <!-- R5_TABLES --> markers
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

R5 = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                  "..", "results", "r5")
METRICS = ("stoi", "pesq", "ssnr", "csii", "ncm")


def load(name):
    path = os.path.join(R5, f"eval_{name}.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def cells(payload, method):
    """metric -> all per-utterance values across the full grid."""
    out = {k: [] for k in METRICS}
    for by_method in payload["results"].values():
        if method not in by_method:
            return None
        for by_snr in by_method[method].values():
            for k in METRICS:
                out[k].extend(by_snr[k])
    return out


def grand(payload, method):
    c = cells(payload, method)
    return None if c is None else {k: float(np.mean(v))
                                   for k, v in c.items()}


def per_noise(payload, method):
    rows = {}
    for nz, by_method in payload["results"].items():
        vals = {k: [] for k in METRICS}
        for by_snr in by_method[method].values():
            for k in METRICS:
                vals[k].extend(by_snr[k])
        rows[nz] = {k: float(np.mean(v)) for k, v in vals.items()}
    return rows


def fmt(row, prec=4):
    return " | ".join(
        "—" if row is None else
        (f"{row[k]:.2f}" if k == "ssnr" else f"{row[k]:.{prec}f}")
        for k in METRICS)


def main():
    print("## Cross-pipeline grand table (4 noises × 4 SNRs × 8 utt, "
          "multi-noise-trained, val protocol 2)\n")
    print("| model | " + " | ".join(m.upper() for m in METRICS) + " |")
    print("|---|" + "---|" * len(METRICS))
    v4 = load("v4s0")
    rows = [("Noisy", v4, "noisy"),
            ("PCIRM-DNN", load("dnn"), "pcirm"),
            ("DCSE", load("dcse"), "conformer"),
            ("Metacog v4 (single)", v4, "sincformer"),
            ("Metacog v5 (dual)", load("v5s0"), "sincformer"),
            ("Metacog msa3", load("msa3"), "sincformer"),
            ("Metacog v4 ext150", load("ext150"), "sincformer")]
    for label, payload, method in rows:
        row = grand(payload, method) if payload else None
        print(f"| {label} | {fmt(row)} |")

    print("\n## Flagship v4 per-noise breakdown\n")
    if v4:
        print("| noise | " + " | ".join(m.upper() for m in METRICS) + " |")
        print("|---|" + "---|" * len(METRICS))
        for nz, row in per_noise(v4, "sincformer").items():
            print(f"| {nz} | {fmt(row)} |")

    print("\n## PA v4 vs v5, 3 seeds (mean ± std over seeds)\n")
    print("| variant | " + " | ".join(m.upper() for m in METRICS) + " |")
    print("|---|" + "---|" * len(METRICS))
    for variant in ("v4", "v5"):
        per_seed = []
        for s in (0, 1, 2):
            p = load(f"{variant}s{s}")
            if p:
                g = grand(p, "sincformer")
                if g:
                    per_seed.append(g)
        if not per_seed:
            print(f"| {variant} | " + " | ".join("—" for _ in METRICS)
                  + " |")
            continue
        cols = []
        for k in METRICS:
            vs = [g[k] for g in per_seed]
            prec = 2 if k == "ssnr" else 4
            cols.append(f"{np.mean(vs):.{prec}f}±{np.std(vs):.{prec}f}")
        print(f"| {variant} (n={len(per_seed)}) | " + " | ".join(cols)
              + " |")

    # ── final vs best (early-stopped) checkpoints ──────────────────────
    # eval_<name>.json scored the *final* checkpoint (historical load
    # preference); eval_best_<name>.json re-scores the best-val one via
    # `evaluate --ckpt best`. Report both + the SSNR gap.
    best_names = [("Metacog v4 (single)", "v4s0", "sincformer"),
                  ("Metacog v5 (dual)", "v5s0", "sincformer"),
                  ("DCSE", "dcse", "conformer"),
                  ("PCIRM-DNN", "dnn", "pcirm"),
                  ("Metacog msa3", "msa3", "sincformer"),
                  ("Metacog v4 ext150", "ext", "sincformer")]
    have_best = any(load(f"best_{n}") for _, n, _ in best_names)
    if have_best:
        print("\n## Final vs best-val checkpoint (early stopping), "
              "same grid\n")
        print("| model | ckpt | " + " | ".join(m.upper() for m in METRICS)
              + " | ΔSSNR |")
        print("|---|---|" + "---|" * (len(METRICS) + 1))
        for label, name, method in best_names:
            fin = load(name if name != "ext" else "ext150")
            bst = load(f"best_{name}")
            g_f = grand(fin, method) if fin else None
            g_b = grand(bst, method) if bst else None
            d = (f"{g_b['ssnr'] - g_f['ssnr']:+.2f}"
                 if g_f and g_b else "—")
            print(f"| {label} | final | {fmt(g_f)} | |")
            print(f"| {label} | best | {fmt(g_b)} | {d} |")

    # ── int8 serving artifact vs its source checkpoint ────────────────
    # eval_best_v4s0_int8.json scores the committed deployment artifact
    # (artifacts/r5/sincformer_v4s0_best_serving, `cli export --ckpt
    # best`: per-channel int8 + stochastic rounding, 3065→16 MB) on the
    # same grid as its f32 source — the price of the 192× compression.
    q = load("best_v4s0_int8")
    if q:
        print("\n## int8 serving artifact (cli export) vs f32 source, "
              "same grid\n")
        print("| checkpoint | " + " | ".join(m.upper() for m in METRICS)
              + " |")
        print("|---|" + "---|" * len(METRICS))
        g_f = grand(load("best_v4s0"), "sincformer")
        g_q = grand(q, "sincformer")
        print(f"| v4s0 best (f32, 3.0 GB family) | {fmt(g_f)} |")
        print(f"| v4s0 best exported (int8, 16 MB) | {fmt(g_q)} |")
        print("| Δ | " + " | ".join(
            f"{g_q[k] - g_f[k]:+.{2 if k == 'ssnr' else 4}f}"
            for k in METRICS) + " |")

    # ── speech-diversity probe (round-5b): varied-utterance corpus ────
    # Scores on the varied grid use different clean signals than the
    # formant grid — the two tables are NOT cross-comparable; the noisy
    # row anchors each grid.
    vd = load("vd64_varied")
    if vd:
        print("\n## Speech-diversity probe: varied-utterance grid "
              "(4 noises × 4 SNRs × 8 held-out varied utt)\n")
        print("| model (training corpus) | "
              + " | ".join(m.upper() for m in METRICS) + " |")
        print("|---|" + "---|" * len(METRICS))
        vrows = [("Noisy", vd, "noisy"),
                 ("Metacog v4 (64 varied)", vd, "sincformer"),
                 ("Metacog v4 (256 varied)", load("vd256_varied"),
                  "sincformer"),
                 ("Metacog v4 (1024 varied)", load("vd1024_varied"),
                  "sincformer"),
                 ("Metacog v4 (64 formant)", load("v4s0_varied"),
                  "sincformer"),
                 ("DCSE (64 varied)", load("dcse_vd"), "conformer"),
                 ("DCSE (256 varied)", load("dcse_vd256"), "conformer")]
        for label, payload, method in vrows:
            row = grand(payload, method) if payload else None
            print(f"| {label} | {fmt(row)} |")
        # best-val checkpoints on the same varied grid (round-5c)
        vbest = [("Metacog v4 (64 varied)", "vd64", "sincformer"),
                 ("Metacog v4 (256 varied)", "vd256", "sincformer"),
                 ("Metacog v4 (1024 varied)", "vd1024", "sincformer"),
                 ("DCSE (64 varied)", "dcse_vd", "conformer"),
                 ("DCSE (256 varied)", "dcse_vd256", "conformer")]
        if any(load(f"best_{n}") for _, n, _ in vbest):
            print("\nBest-val checkpoints of the varied-trained models "
                  "(same grid; `evaluate --ckpt best`):\n")
            print("| model | " + " | ".join(m.upper() for m in METRICS)
                  + " |")
            print("|---|" + "---|" * len(METRICS))
            for label, name, method in vbest:
                b = load(f"best_{name}")
                row = grand(b, method) if b else None
                print(f"| {label} best | {fmt(row)} |")
        # round-5d budget extension: both scaling points resumed to 100
        # epochs under identical settings (scripts/r5d_budget.sh) — the
        # direct test of the "vd1024 is epoch-budget-limited" claim.
        e100 = [("Metacog v4 (256 varied) @100ep", "vd256_e100"),
                ("Metacog v4 (1024 varied) @100ep", "vd1024_e100")]
        if any(load(n) or load(f"best_{n}") for _, n in e100):
            print("\nBudget extension (round-5d): the same two models "
                  "resumed 50→100 epochs, same grid:\n")
            print("| model | ckpt | " + " | ".join(m.upper()
                  for m in METRICS) + " |")
            print("|---|---|" + "---|" * len(METRICS))
            for label, name in e100:
                for ck, payload in (("final", load(name)),
                                    ("best", load(f"best_{name}"))):
                    row = grand(payload, "sincformer") if payload else None
                    print(f"| {label} | {ck} | {fmt(row)} |")
        xf = load("vd64_formant")
        if xf:
            print("\nCross-corpus: the varied-trained flagship scored on "
                  "the FORMANT grid (vs the formant-trained v4s0 row of "
                  "the grand table):\n")
            print("| model | " + " | ".join(m.upper() for m in METRICS)
                  + " |")
            print("|---|" + "---|" * len(METRICS))
            print(f"| Metacog v4 (64 varied) on formant grid | "
                  f"{fmt(grand(xf, 'sincformer'))} |")
            if v4:
                print(f"| Metacog v4 (64 formant) on formant grid | "
                      f"{fmt(grand(v4, 'sincformer'))} |")

    # ── training-curve summary (saturation probe, VERDICT r4 #6) ──────
    import glob as _glob
    curves = sorted(_glob.glob(os.path.join(R5, "train_*.jsonl")))
    if curves:
        print("\n## Training curves: best-val epoch per run "
              "(saturation probe)\n")
        print("| run | epochs | best-val epoch | best val | final val |")
        print("|---|---|---|---|---|")
        for path in curves:
            rows_j = [json.loads(ln) for ln in open(path)]
            rows_j = [r for r in rows_j
                      if r.get("val_loss") is not None]
            if not rows_j:
                continue
            b = min(rows_j, key=lambda r: r["val_loss"])
            name = os.path.basename(path)[len("train_"):-len(".jsonl")]
            print(f"| {name} | {rows_j[0]['epoch']}–{rows_j[-1]['epoch']} "
                  f"| {b['epoch']} | {b['val_loss']:.4f} "
                  f"| {rows_j[-1]['val_loss']:.4f} |")

    # noisy-column cross-check: the eval protocol is deterministic, so
    # the baseline must be bit-identical across every run dir
    noisy_rows = [grand(p, "noisy") for _, p, _ in rows[1:] if p]
    base = grand(v4, "noisy") if v4 else None
    if base and noisy_rows:
        worst = max(abs(r[k] - base[k]) for r in noisy_rows for k in METRICS)
        print(f"\nnoisy-column max cross-run delta: {worst:.2e} "
              f"({'OK — shared protocol verified' if worst < 1e-9 else 'MISMATCH'})")


def write_results_md():
    """Regenerate the table block in RESULTS.md (idempotent): everything
    between ``<!-- R5_TABLES -->`` and ``<!-- /R5_TABLES -->`` is replaced
    by this script's stdout, so the committed tables are always derivable
    from the committed artifacts by one command."""
    import io
    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main()
    results = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "RESULTS.md")
    text = open(results).read()
    start, end = "<!-- R5_TABLES -->", "<!-- /R5_TABLES -->"
    block = f"{start}\n\n{buf.getvalue().rstrip()}\n\n{end}"
    if end in text:
        import re
        text = re.sub(re.escape(start) + ".*?" + re.escape(end),
                      lambda _: block, text, count=1, flags=re.S)
    else:
        text = text.replace(start, block, 1)
    with open(results, "w") as f:
        f.write(text)
    print(f"RESULTS.md table block updated ({len(buf.getvalue())} chars)")


if __name__ == "__main__":
    if "--write" in sys.argv:
        write_results_md()
    else:
        sys.exit(main())
