"""Collect the TPU evidence-suite logs (/tmp/ev_*.log, /tmp/ab_*.log) into
committed JSON.

Run after benchmarks/run_all_tpu.sh (and/or individual benchmarks/ab_knobs
runs). Writes EVIDENCE_r5.json at the repo root summarising: 256^3 / 512^3
bench, 50k matcher scale + threshold sweep, match-precision timing, every
parity-gated kernel A/B, the stage profile, the roofline, the ground-truth
parity artifacts (64/128/256/512 + the residue/descriptor-tail
diagnoses), and the reference-binary thread-scaling measurement
(from BENCH_CPU_CACHE.json).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
LOGS = {
    "bench_256": "/tmp/ev_bench256.log",
    "bench_512": "/tmp/ev_bench512.log",
    "match_50k": "/tmp/ev_match50k.log",
    "match_precision": "/tmp/ev_matchprec.log",
    "stage_profile": "/tmp/ev_stages.log",
    "throughput_256": "/tmp/ev_throughput.log",
    # parity-gated A/Bs (benchmarks/ab_knobs.py): kp/match sets must equal
    # the recorded baseline for the run to exit 0.
    "ab_accum_3pass": "/tmp/ab_3pass.log",
    "ab_match_high": "/tmp/ab_matchhigh.log",
    "ab_blur_high": "/tmp/ab_blurhigh.log",
    "ab_face_mxu": "/tmp/ab_facemxu.log",
    "ab_kp_block": "/tmp/ab_kpblock.log",
    "ab_desc_tile": "/tmp/ab_desctile.log",
    "ab_face_shared": "/tmp/ab_faceshared.log",
    "ab_blur_taps2": "/tmp/ab_blurtaps2.log",
    "ab_row_skip": "/tmp/ab_rowskip.log",
    "ab_downsample_matmul": "/tmp/ab_downsample.log",
    "ab_blur_barrier": "/tmp/ab_barrier.log",
    # round-4 A/Bs
    "ab_r4_cumulative": "/tmp/ab_r4_cumulative.log",
    "ab_face_anti": "/tmp/ab_faceanti.log",
    # round-5 A/Bs
    "ab_base_r5": "/tmp/ab_base_r5.log",
    "ab_face_sym": "/tmp/ab_facesym.log",
    "ab_desc_sparse": "/tmp/ab_descsparse.log",
    "desc_vpu": "/tmp/ev_descvpu.log",
    # on-TPU sublane-unaligned detect parity (advisor r4 low #4)
    "detect_unaligned_tpu": "/tmp/ev_detectunaligned.log",
}


def all_json_lines(path: str):
    """Every JSON line of a log, keyed by its 'mode' field (falling back to
    the line index). match_scale.py emits one line per matcher mode —
    keeping only the last dropped the biject rows (VERDICT r4 missing #3)."""
    p = Path(path)
    if not p.exists():
        return None
    out = {}
    for i, line in enumerate(p.read_text().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            out[str(row.get("mode", i))] = row
    return out or None


def last_json_line(path: str):
    p = Path(path)
    if not p.exists():
        return None
    out = None
    for line in p.read_text().splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                out = json.loads(line)
            except json.JSONDecodeError:
                pass
    if out is None:
        txt = p.read_text()
        m = re.search(r"\{.*\}", txt, re.DOTALL)
        if m:
            try:
                out = json.loads(m.group(0))
            except json.JSONDecodeError:
                out = None
    return out


def main():
    ev = {}
    for key, path in LOGS.items():
        val = (all_json_lines(path) if key in ("match_50k", "ab_desc_sparse")
               else last_json_line(path))
        if val is not None:
            ev[key] = val
    # Historical A/B logs live in /tmp and do not survive reboots; carry any
    # missing ab_* section forward from the previous round's evidence file,
    # explicitly tagged so fresh and carried measurements are never confused.
    prev = REPO / "EVIDENCE_r4.json"
    if prev.exists():
        old = json.loads(prev.read_text())
        for key in LOGS:
            if key.startswith("ab_") and key not in ev and key in old:
                carried = old[key]
                if isinstance(carried, dict):
                    carried = dict(carried, carried_from="EVIDENCE_r4")
                ev[key] = carried
    for name, key in (("ROOFLINE.json", "roofline"),
                      ("SCALING_r05.json", "scaling"),
                      ("PARITY_VS_REFERENCE.json", "parity_vs_reference_64"),
                      ("PARITY_VS_REFERENCE_128.json",
                       "parity_vs_reference_128"),
                      ("PARITY_VS_REFERENCE_256.json",
                       "parity_vs_reference_256"),
                      ("PARITY_VS_REFERENCE_512.json",
                       "parity_vs_reference_512"),
                      ("PARITY_VS_REFERENCE_ANISO.json",
                       "parity_vs_reference_aniso"),
                      ("PARITY_VS_REFERENCE_ANISO_LARGE.json",
                       "parity_vs_reference_aniso_large"),
                      ("RESIDUE_256.json", "residue_diagnosis_256"),
                      ("DESC_TAIL_256.json", "desc_tail_diagnosis_256"),
                      ("BENCH_512_r05.json", "bench_512_artifact"),
                      ("EXTRACT_LARGE_r05.json", "extract_768_single_volume"),
                      ("EXTRACT_LARGE_FULLRECALL_r05.json",
                       "extract_768_full_recall"),
                      ("DMA_PROBE_r05.json", "dma_probe_reprobe")):
        p = REPO / name
        if p.exists():
            ev[key] = json.loads(p.read_text())
    cache = REPO / "BENCH_CPU_CACHE.json"
    if cache.exists():
        c = json.loads(cache.read_text())
        if "reference_256" in c:
            ev["reference_binary_256"] = c["reference_256"]
    out = REPO / "EVIDENCE_r5.json"
    out.write_text(json.dumps(ev, indent=1))
    print(f"wrote {out} with sections: {sorted(ev)}")


if __name__ == "__main__":
    main()
