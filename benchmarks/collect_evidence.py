"""Collect the TPU evidence-suite logs (/tmp/ev_*.log) into committed JSON.

Run after benchmarks/run_all_tpu.sh. Writes EVIDENCE_r2.json at the repo
root summarising: 256^3 bench, 512^3 bench, 50k matcher scale + sweep
equality, precision A/B, kernel A/Bs, roofline pointer.
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
    "ab_face_mxu": "/tmp/ev_ab_facemxu.log",
    "ab_accum_group1": "/tmp/ev_ab_accum1.log",
    "ab_blur_high": "/tmp/ev_ab_blurhigh.log",
    "stage_profile": "/tmp/ev_stages.log",
}


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
                # stage profile prints a multi-line json dict
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
        val = last_json_line(path)
        if val is not None:
            ev[key] = val
    roof = REPO / "ROOFLINE.json"
    if roof.exists():
        ev["roofline"] = json.loads(roof.read_text())
    out = REPO / "EVIDENCE_r2.json"
    out.write_text(json.dumps(ev, indent=1))
    print(f"wrote {out} with sections: {sorted(ev)}")


if __name__ == "__main__":
    main()
