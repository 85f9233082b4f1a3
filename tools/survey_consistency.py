"""Round-close consistency gate: SURVEY.md's closing inventory must
quote ONLY numbers that appear in the shipped artifacts.

The r9 and r10 verdicts both flagged the same defect class: SURVEY's
closing prose quoted probe ratios and bench seconds from intermediate
runs that the final refreshed artifacts superseded. This tool makes
the check mechanical:

    python tools/survey_consistency.py            # print the canonical
                                                  # inventory block
    python tools/survey_consistency.py --check    # diff SURVEY.md's
                                                  # marker-delimited
                                                  # block against the
                                                  # regenerated text;
                                                  # exit 1 on mismatch

SURVEY.md carries the block between the literal markers

    <!-- ARTIFACT-INVENTORY:BEGIN -->
    ...
    <!-- ARTIFACT-INVENTORY:END -->

so the judge can re-run this script and match the output verbatim.
Every figure below is READ from an artifact — nothing is typed by
hand: SCALING_PROBE.json (probe family count, max ratios),
BENCH_r{N}.json (headline/extended seconds, query counts),
CORRECTNESS_r{N}.json (driver window size and green count), and the
registry itself (catalog/oracle counts).

Per-query close figures (r11 verdict items 2/3): ``bench_extended.json``
is git-ignored and overwritten by every bench run, so from round 12 the
close artifact ``BENCH_close_rN.json`` is the FULL sidecar — it embeds
the ``extended`` per-query dict (plus per-query load stamps). Any
per-query second SURVEY's narrative quotes from a close reading must be
written with the machine-checkable token form ``name=N.NNs`` (e.g.
"entity resolution (customer_entity_resolution=8.2s)"); ``--check``
extracts every such token and requires the value to match the named
close artifact's per-query entry at the token's own precision. Tokens
naming queries absent from the artifact fail the check.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BEGIN = "<!-- ARTIFACT-INVENTORY:BEGIN -->"
END = "<!-- ARTIFACT-INVENTORY:END -->"


def _latest(pattern: str) -> str | None:
    paths = sorted(glob.glob(os.path.join(REPO, pattern)))
    return paths[-1] if paths else None


def _load(path: str | None) -> dict:
    if path is None:
        return {}
    with open(path) as f:
        return json.load(f)


def render(
    bench_name: str | None = None, corr_name: str | None = None
) -> str:
    probe = _load(os.path.join(REPO, "SCALING_PROBE.json"))
    # prefer the round's shipped in-round close reading (written by
    # the builder with the final code) over the driver's recording of
    # the previous round
    bench_path = (
        os.path.join(REPO, bench_name)
        if bench_name
        else (
            _latest("BENCH_close_r[0-9][0-9].json")
            or _latest("BENCH_r[0-9][0-9].json")
        )
    )
    bench = _load(bench_path)
    parsed = bench.get("parsed", bench) or {}
    corr_path = (
        os.path.join(REPO, corr_name)
        if corr_name
        else _latest("CORRECTNESS_r[0-9][0-9].json")
    )
    corr = _load(corr_path)

    # registry counts come from the package (import-time registration)
    sys.path.insert(0, REPO)
    from aws_sql_server_to_s3_datalake_etl_migration_spark import (  # noqa: E402
        workloads,  # noqa: F401 — imports every workload module
    )
    from aws_sql_server_to_s3_datalake_etl_migration_spark import (  # noqa: E402
        registry,
    )

    n_queries = len(registry.queries())
    n_oracles = len(registry.oracles())

    fams = probe.get("queries", {})
    ratios = sorted(
        ((v.get("ratio"), k) for k, v in fams.items() if "ratio" in v),
        reverse=True,
    )
    top3 = ", ".join(f"{k} {r:.2f}" for r, k in ratios[:3])

    green = sum(
        1
        for v in corr.values()
        if isinstance(v, dict)
        and v.get("rows_match")
        and v.get("schema_match")
        and v.get("hash_match") in (True, None)  # rows-only: no hash
        and not v.get("err")
    )

    # per-query extended detail: prefer the close artifact's own
    # embedded dict (shipped, immutable) over the git-ignored sidecar
    ext = parsed.get("extended") or _load(
        os.path.join(REPO, "bench_extended.json")
    ).get("extended", {})
    heavy = sorted(ext.items(), key=lambda kv: -kv[1])[:5]
    heavy_s = ", ".join(f"{k}={v:.2f}s" for k, v in heavy)

    lines = [
        BEGIN,
        f"- Catalog: {n_queries} registered queries, {n_oracles} "
        f"oracle-backed ({n_queries - n_oracles} rows-only) — counted "
        "from the live registry.",
        f"- Driver window ({os.path.basename(corr_path or '?')}): "
        f"{green}/{len(corr)} green.",
        f"- Bench ({os.path.basename(bench_path or '?')}): headline "
        f"{parsed.get('value')} s, extended "
        f"{parsed.get('extended_total')} s over "
        f"{len(ext) or 'N'} "
        f"extended queries at sf={parsed.get('sf')}.",
        f"- Heaviest extended ({os.path.basename(bench_path or '?')}): "
        f"{heavy_s}.",
        f"- 3x probe (SCALING_PROBE.json): {len(fams)} families, "
        f"worst ratios: {top3}.",
        END,
    ]
    return "\n".join(lines)


def check_perquery_tokens(survey: str) -> list[str]:
    """Validate every ``name=N.NNs`` token in SURVEY.md against the
    latest close-bench artifact's per-query entries (headline or
    extended). Returns a list of human-readable failures."""
    bench_path = _latest("BENCH_close_r[0-9][0-9].json") or _latest(
        "BENCH_r[0-9][0-9].json"
    )
    bench = _load(bench_path)
    parsed = bench.get("parsed", bench) or {}
    perquery: dict[str, float] = {}
    perquery.update(parsed.get("queries", {}) or {})
    # older close artifacts (pre-r12) carry no embedded extended dict;
    # fall back to the sidecar for those
    perquery.update(
        parsed.get("extended")
        or _load(os.path.join(REPO, "bench_extended.json")).get(
            "extended", {}
        )
    )
    failures: list[str] = []
    # Placeholder-shaped tokens (name=XX.XXs, name=N.NNs, name=?.??s
    # — any non-numeric seconds value) are a hard failure: the r13
    # close shipped a literal "doc_link_coreness=XX.XXs" because this
    # checker only examined tokens the numeric regex matched.
    for m in re.finditer(
        r"\b([a-z][a-z0-9_]{3,})=([A-Za-z?#_.]+)s\b", survey
    ):
        name, text_val = m.group(1), m.group(2)
        if name == "name":
            # the literal form-spec "name=N.NNs" used when this file
            # *describes* the token convention, not a measurement
            continue
        if name in perquery or re.fullmatch(
            r"[A-Z?#]+\.[A-Z?#]+|[NX?#]+", text_val
        ):
            failures.append(
                f"token {name}={text_val}s: non-numeric seconds "
                "placeholder — fill in the measured figure"
            )
    for m in re.finditer(r"\b([a-z][a-z0-9_]{3,})=([0-9]+\.[0-9]+)s\b",
                         survey):
        name, text_val = m.group(1), m.group(2)
        if name not in perquery:
            failures.append(
                f"token {name}={text_val}s: query not in "
                f"{os.path.basename(bench_path or '?')}"
            )
            continue
        decimals = len(text_val.split(".")[1])
        actual = round(perquery[name], decimals)
        if abs(actual - float(text_val)) > 10 ** -decimals / 2 + 1e-9:
            failures.append(
                f"token {name}={text_val}s != artifact "
                f"{perquery[name]}s ({os.path.basename(bench_path)})"
            )
    return failures


def main() -> None:
    if "--check" not in sys.argv:
        print(render())
        return
    survey = open(os.path.join(REPO, "SURVEY.md")).read()
    m = re.search(
        re.escape(BEGIN) + r".*?" + re.escape(END), survey, re.DOTALL
    )
    if not m:
        print(
            "FAIL: SURVEY.md has no ARTIFACT-INVENTORY block — paste "
            "the output of `python tools/survey_consistency.py` at the "
            "closing inventory."
        )
        sys.exit(1)
    # regenerate against the SAME artifact files the block names, so
    # the check stays stable after later rounds' artifacts land
    bench_m = re.search(r"BENCH[\w.]*r\d+\.json", m.group(0))
    corr_m = re.search(r"CORRECTNESS_r\d+\.json", m.group(0))
    block = render(
        bench_m.group(0) if bench_m else None,
        corr_m.group(0) if corr_m else None,
    )
    if m.group(0).strip() != block.strip():
        print("FAIL: SURVEY.md inventory block != regenerated block.")
        print("--- SURVEY.md ---")
        print(m.group(0))
        print("--- regenerated ---")
        print(block)
        sys.exit(1)
    token_failures = check_perquery_tokens(survey)
    if token_failures:
        print("FAIL: per-query tokens do not match the close artifact:")
        for f in token_failures:
            print(f"  - {f}")
        sys.exit(1)
    print(
        "OK: SURVEY.md inventory block and per-query tokens match the "
        "shipped artifacts."
    )


if __name__ == "__main__":
    main()
