"""Deterministic synthetic clinical fixtures matching FIXTURES.md §1 — the
source views the reference's seven analyte programs consume. All columns
are strings (the reference's working model); dates use the workbook
formats; ~10% NULLs on date columns; duplicate rows included to exercise
every distinct/dedup path.

Constructed so that order-ambiguous reference idioms are value-determined:
  - (Subject, treatment) unique across DOSEDISC1 ∪ DOSEDISC2 (slice ties)
  - every EX treatment has a matching DOSEDISC row (SUMEQ gate == True)
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd

FMT_DT = "%d-%m-%Y %H:%M"
FMT_D = "%Y-%m-%d"
TREATMENTS = ["Carboplatin", "Paclitaxel", "Bevacizumab", "Durvalumab/Placebo"]
COUNTRIES = ["DE", "FR", "US", "JP"]
BASE = datetime(2021, 1, 1, 0, 0)


def _dt(rng: random.Random) -> str:
    return (BASE + timedelta(minutes=rng.randrange(0, 525600))).strftime(FMT_DT)


def _d(rng: random.Random) -> str:
    return (BASE + timedelta(days=rng.randrange(0, 365))).strftime(FMT_D)


def _maybe(rng: random.Random, val: str, p_null: float = 0.1):
    return None if rng.random() < p_null else val


def generate(out_dir: str, n_subjects: int = 120, seed: int = 7) -> None:
    rng = random.Random(seed)
    subjects = [f"E{i:04d}" for i in range(1, n_subjects + 1)]
    sites = [str(1200 + i) for i in range(1, 9)]
    site_of = {s: rng.choice(sites) for s in subjects}
    country_of = {site: COUNTRIES[i % len(COUNTRIES)] for i, site in enumerate(sites)}

    def write(name: str, rows: list[dict]) -> None:
        pd.DataFrame(rows).to_parquet(f"{out_dir}/{name}.parquet", index=False)

    # ENROL: per-site rows with some nulls and duplicates (Distinct=N)
    enrol = []
    for site in sites:
        row = {"SiteGroup": _maybe(rng, country_of[site]),
               "SiteNumber": _maybe(rng, site, 0.05)}
        enrol.append(row)
        if rng.random() < 0.3:
            enrol.append(dict(row))  # duplicate row survives (no dedup)
    write("ENROL", enrol)

    # IxRS: one row per subject
    write("IxRS", [{"CentreNum": _maybe(rng, site_of[s], 0.05), "ECode": s}
                   for s in subjects])

    # DS: 0-2 rows per subject; codes C28554 (death), C48227 (ltfu), other
    ds = []
    for s in subjects:
        for _ in range(rng.randrange(0, 3)):
            ds.append({"Subject": s, "DSSTDAT": _maybe(rng, _dt(rng)),
                       "DSDECOD_STD": rng.choice(
                           ["C28554", "C48227", "C11111", "C28554"])})
    ds += [dict(r) for r in rng.sample(ds, k=min(10, len(ds)))]  # dup rows
    write("DS", ds)

    write("DEATH", [{"Subject": s, "DTH_DAT": _maybe(rng, _dt(rng))}
                    for s in subjects if rng.random() < 0.35])

    write("SURVIVE", [{"Subject": s, "SUR_DAT": _maybe(rng, _dt(rng)),
                       "SURSTAT_STD": rng.choice(["1", "2", "2"])}
                      for s in subjects if rng.random() < 0.5])

    write("HOSPAD", [{"Subject": s, "HADMSDT": _maybe(rng, _dt(rng), 0.2),
                      "HADMEDT": _maybe(rng, _dt(rng), 0.2)}
                     for s in subjects if rng.random() < 0.5])

    write("DOSEDISC", [{"Subject": s, "IPDC_DAT": _maybe(rng, _dt(rng)),
                        "IP_DISC_STD": rng.choice(["1", "1", "2"])}
                       for s in subjects if rng.random() < 0.5])

    # EX/EX1 + DOSEDISC1/2: (subject, treatment) pairs; every pair gets a
    # matching DOSEDISC row so the SUMEQ gate holds; DOSEDISC pairs unique.
    pairs: list[tuple[str, str]] = []
    ex, ex1 = [], []
    for s in subjects:
        if rng.random() < 0.6:
            for trt in rng.sample(TREATMENTS, k=rng.randrange(1, 3)):
                pairs.append((s, trt))
                target = ex if rng.random() < 0.5 else ex1
                target.append({"Subject": s, "EXSTDAT": _dt(rng), "EXTRT": trt})
                if rng.random() < 0.3:  # cross-listed in both views
                    (ex1 if target is ex else ex).append(
                        {"Subject": s, "EXSTDAT": _dt(rng), "EXTRT": trt})
    # null EXSTDAT rows are filtered at scan — harmless noise
    ex += [{"Subject": rng.choice(subjects), "EXSTDAT": None,
            "EXTRT": rng.choice(TREATMENTS)} for _ in range(8)]
    write("EX", ex)
    write("EX1", ex1 or [{"Subject": subjects[0], "EXSTDAT": None,
                          "EXTRT": TREATMENTS[0]}])
    dd1, dd2 = [], []
    for s, trt in pairs:
        row = {"Subject": s, "IPDC_DAT": _d(rng), "SD": trt}
        (dd1 if rng.random() < 0.5 else dd2).append(row)
    write("DOSEDISC1", dd1 or [{"Subject": subjects[0], "IPDC_DAT": None,
                                "SD": TREATMENTS[0]}])
    write("DOSEDISC2", dd2 or [{"Subject": subjects[0], "IPDC_DAT": None,
                                "SD": TREATMENTS[0]}])

    write("CAPRXHC", [
        {"Subject": s, "PageRepeatNumber": str(rng.randrange(1, 4)),
         "CXSDAT": _maybe(rng, _d(rng)), "CXEDAT": _maybe(rng, _d(rng)),
         "TREATSTS": rng.choice(["Ongoing", "Completed"]),
         "CXAGNT": rng.choice(["AgentA", "AgentB"]),
         "CXCLASS": rng.choice(["ClassX", "ClassY"]),
         "CXCHERAD": rng.choice(["Yes", "No"])}
        for s in subjects if rng.random() < 0.4 for _ in range(rng.randrange(1, 3))
    ])

    write("PFU", [{"Subject": s, "PFUTYP_STD": str(rng.randrange(1, 9)),
                   "PFUTYPSE": rng.choice(["Yes", "Yes", "No"])}
                  for s in subjects if rng.random() < 0.7])
