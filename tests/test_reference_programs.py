"""End-to-end parity: run the reference's OWN seven analyte workbooks
(read directly from /root/reference) through the engine on synthetic
clinical fixtures, and verify every analyte output against an independent
DuckDB oracle over the same parquet files. SURVEY §5.2 item 2."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from check_oracle import compare  # noqa: E402

from configurable_etl_python_repo_spark.config.excel import (  # noqa: E402
    parse_study,
    view_dir_resolver,
)
from configurable_etl_python_repo_spark.plans import Engine  # noqa: E402

REF = "/root/reference"
VIEWS = ["ENROL", "IxRS", "DS", "DEATH", "SURVIVE", "HOSPAD", "DOSEDISC",
         "EX", "EX1", "DOSEDISC1", "DOSEDISC2", "CAPRXHC", "PFU"]


@pytest.fixture(scope="module")
def study_run(spark, tmp_path_factory):
    from clinical_fixtures import generate

    data_dir = str(tmp_path_factory.mktemp("clinical"))
    generate(data_dir)
    study = parse_study(
        f"{REF}/study_configuration.xlsx",
        view_dir_resolver(data_dir),
        workbook_path=lambda cfg: f"{REF}/{cfg}",
    )
    eng = Engine(spark)
    standardized = eng.run_study(study)
    con = duckdb.connect()
    for v in VIEWS:
        con.execute(
            f'CREATE VIEW "{v}" AS SELECT * FROM read_parquet(\'{data_dir}/{v}.parquet\')'
        )
    return eng, standardized, con


# ---------------------------------------------------------------------------
# DuckDB oracles replaying the workbook semantics independently
# ---------------------------------------------------------------------------

O_SUBJECT_DEATH = """
WITH c_ds AS (SELECT DISTINCT Subject, DSSTDAT FROM DS WHERE DSDECOD_STD = 'C28554'),
c_death AS (SELECT DISTINCT Subject, DTH_DAT FROM DEATH),
dsp AS (SELECT Subject, strptime(DSSTDAT, '%d-%m-%Y %H:%M') AS ds_dt FROM c_ds),
dp AS (SELECT Subject, strptime(DTH_DAT, '%d-%m-%Y %H:%M') AS dth_dt FROM c_death),
j AS (SELECT COALESCE(dsp.Subject, dp.Subject) AS subject,
             least(ds_dt, dth_dt) AS subject_death
      FROM dsp FULL OUTER JOIN dp ON dsp.Subject = dp.Subject)
SELECT DISTINCT subject, subject_death FROM j
WHERE subject IS NOT NULL AND subject_death IS NOT NULL
"""

O_SUBJECT_LTFU = """
WITH c_ds AS (SELECT DISTINCT Subject, DSSTDAT FROM DS WHERE DSDECOD_STD = 'C48227'),
c_sur AS (SELECT DISTINCT Subject, SUR_DAT FROM SURVIVE
        WHERE CAST(SURSTAT_STD AS INTEGER) = 2),
dsp AS (SELECT Subject, strptime(DSSTDAT, '%d-%m-%Y %H:%M') AS ds_dt FROM c_ds),
sp AS (SELECT Subject, strptime(SUR_DAT, '%d-%m-%Y %H:%M') AS sur_dt FROM c_sur),
j AS (SELECT COALESCE(dsp.Subject, sp.Subject) AS subject,
             least(ds_dt, sur_dt) AS ltfu_date
      FROM dsp FULL OUTER JOIN sp ON dsp.Subject = sp.Subject)
SELECT subject, ltfu_date FROM j WHERE ltfu_date IS NOT NULL
"""

O_COUNTRY_SITE = """
WITH c_enrol AS (SELECT SiteGroup AS country, CAST(SiteNumber AS DOUBLE) AS site
               FROM ENROL),
e2 AS (SELECT * FROM c_enrol WHERE country IS NOT NULL AND site IS NOT NULL),
c_ixrs AS (SELECT CAST(CentreNum AS DOUBLE) AS site_d, ECode AS subject FROM IxRS),
j AS (SELECT e2.country, e2.site, i.subject FROM e2
      LEFT JOIN c_ixrs i ON e2.site = i.site_d)
SELECT country, site, subject FROM j
WHERE site IS NOT NULL AND subject IS NOT NULL
"""

O_SUBTHER = """
WITH c_cap AS (SELECT DISTINCT Subject, PageRepeatNumber, CXSDAT, CXEDAT,
                    TREATSTS, CXAGNT, CXCLASS, CXCHERAD FROM CAPRXHC),
p AS (SELECT Subject AS subject, strptime(CXSDAT, '%Y-%m-%d') AS subther_start_date,
             CASE CXCHERAD WHEN 'Yes' THEN true WHEN 'No' THEN false END
               AS concomitant
      FROM c_cap)
SELECT DISTINCT subject, subther_start_date, concomitant FROM p
"""

_ALL_IPDC_CTES = """
ex_scan AS (SELECT DISTINCT Subject, EXSTDAT, EXTRT FROM EX
            WHERE EXSTDAT IS NOT NULL),
ex1_scan AS (SELECT DISTINCT Subject, EXSTDAT, EXTRT FROM EX1
             WHERE EXSTDAT IS NOT NULL),
all_ex AS (SELECT * FROM ex_scan UNION ALL SELECT * FROM ex1_scan),
grouped AS (SELECT Subject AS subject, EXTRT AS treatment,
                   MIN(EXSTDAT) AS exstdat
            FROM all_ex GROUP BY 1, 2),
dd1 AS (SELECT DISTINCT Subject, IPDC_DAT, SD FROM DOSEDISC1
        WHERE IPDC_DAT IS NOT NULL),
dd2 AS (SELECT DISTINCT Subject, IPDC_DAT, SD FROM DOSEDISC2
        WHERE IPDC_DAT IS NOT NULL),
all_dd AS (SELECT Subject AS subject, IPDC_DAT AS discdat, SD AS treatment
           FROM (SELECT * FROM dd1 UNION ALL SELECT * FROM dd2)),
j AS (SELECT g.subject, g.treatment, g.exstdat, d.discdat
      FROM grouped g LEFT JOIN all_dd d
      ON g.subject = d.subject AND g.treatment = d.treatment),
with_std AS (SELECT *,
    CASE treatment WHEN 'Carboplatin' THEN 1 WHEN 'Paclitaxel' THEN 2
         WHEN 'Bevacizumab' THEN 3 WHEN 'Durvalumab/Placebo' THEN 4 END
      AS treatment_std,
    (exstdat IS NOT NULL) AS is_ip_st, (discdat IS NOT NULL) AS is_ip_en
  FROM j),
filtered AS (SELECT * FROM with_std
  WHERE (SELECT SUM(CAST(is_ip_st AS BIGINT)) = SUM(CAST(is_ip_en AS BIGINT))
         FROM with_std)),
sliced AS (SELECT subject, discdat FROM
  (SELECT subject, discdat,
          ROW_NUMBER() OVER (PARTITION BY subject
                             ORDER BY treatment_std DESC) AS rn
   FROM filtered) WHERE rn = 1),
subther AS ({subther}),
unioned AS (
  SELECT subject, strptime(discdat, '%Y-%m-%d') AS ipdc FROM sliced
  UNION ALL SELECT subject, subther_start_date FROM subther),
all_ipdc AS (SELECT subject, MIN(ipdc) AS all_ipdc_date FROM unioned
             GROUP BY subject)
""".format(subther=O_SUBTHER.strip())

O_ALL_IPDC = f"WITH {_ALL_IPDC_CTES} SELECT subject, all_ipdc_date FROM all_ipdc"

O_PLTFU = f"""
WITH {_ALL_IPDC_CTES},
c_pfu AS (SELECT Subject AS subject, PFUTYP_STD FROM PFU WHERE PFUTYPSE = 'Yes'),
jj AS (SELECT a.subject, a.all_ipdc_date, p.PFUTYP_STD
       FROM all_ipdc a LEFT JOIN c_pfu p ON a.subject = p.subject),
d1 AS (SELECT *,
    CASE PFUTYP_STD WHEN '1' THEN 'regular' WHEN '2' THEN 'every second fu'
         WHEN '3' THEN 'regular' WHEN '4' THEN 'end of study'
         WHEN '5' THEN 'end of study' WHEN '6' THEN 'end of study'
         WHEN '7' THEN 'every third fu' WHEN '8' THEN 'end of study' END
      AS grp1
  FROM jj),
d2 AS (SELECT subject,
    CASE WHEN all_ipdc_date IS NULL THEN 'on treatment' ELSE grp1 END
      AS pltfu_thresh_group
  FROM d1),
d3 AS (SELECT subject, pltfu_thresh_group,
    CASE pltfu_thresh_group WHEN 'on treatment' THEN 50 WHEN 'regular' THEN 103
         WHEN 'every second fu' THEN 185 WHEN 'end of study' THEN 271
         WHEN 'every third fu' THEN 1800 END AS pltfu_thresh
  FROM d2 WHERE pltfu_thresh_group IS NOT NULL)
SELECT DISTINCT subject, CAST(pltfu_thresh AS BIGINT) AS pltfu_thresh,
       pltfu_thresh_group
FROM d3
"""

O_LAST_CONTACT_DATE = f"""
WITH sd AS ({O_SUBJECT_DEATH.strip()}),
sl AS ({O_SUBJECT_LTFU.strip()}),
hosp AS (
  SELECT Subject AS subject,
         greatest(strptime(HADMSDT, '%d-%m-%Y %H:%M'),
                  strptime(HADMEDT, '%d-%m-%Y %H:%M')) AS lc, 'HOSPAD' AS lt
  FROM (SELECT DISTINCT Subject, HADMEDT, HADMSDT FROM HOSPAD)),
dose AS (
  SELECT Subject AS subject, strptime(IPDC_DAT, '%d-%m-%Y %H:%M') AS lc,
         'DOSDISC' AS lt
  FROM (SELECT DISTINCT Subject, IPDC_DAT FROM DOSEDISC
        WHERE CAST(IP_DISC_STD AS INTEGER) = 1)),
unioned AS (
  SELECT subject, lc, lt FROM hosp WHERE lc IS NOT NULL
  UNION ALL SELECT subject, lc, lt FROM dose WHERE lc IS NOT NULL
  UNION ALL SELECT subject, subject_death, 'Death' FROM sd
             WHERE subject_death IS NOT NULL
  UNION ALL SELECT subject, ltfu_date, 'Lost to follow up' FROM sl
             WHERE ltfu_date IS NOT NULL)
SELECT subject, MAX(lc) AS last_contact_date,
       list_sort(list(DISTINCT lt) FILTER (lc = MAX(lc) OVER ())) AS _ignore
FROM unioned GROUP BY subject
"""


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("analyte,oracle", [
    ("subject_death", O_SUBJECT_DEATH),
    ("subject_ltfu", O_SUBJECT_LTFU),
    ("country_site_subject", O_COUNTRY_SITE),
    ("subther_pharm", O_SUBTHER),
    ("all_ipdc_date", O_ALL_IPDC),
    ("pltfu_thresh", O_PLTFU),
])
def test_analyte_matches_oracle(study_run, analyte, oracle):
    eng, _, con = study_run
    got = eng.analyte_results[analyte].toPandas()
    want = con.execute(oracle).fetchdf()
    problems = compare(analyte, got, want)
    assert not problems, problems


def test_last_contact_dates_and_types(study_run):
    """last_contact's GROUPBY `last` ties on equal dates are inherently
    order-ambiguous in the reference (stable concat order); we assert the
    date exactly and the type as a member of the argmax set."""
    eng, _, con = study_run
    got = {r.subject: (r.last_contact_date, r.last_contact_type)
           for r in eng.analyte_results["last_contact"].collect()}
    rows = con.execute(f"""
        WITH sd AS ({O_SUBJECT_DEATH}), sl AS ({O_SUBJECT_LTFU}),
        hosp AS (SELECT Subject AS subject,
                        greatest(strptime(HADMSDT, '%d-%m-%Y %H:%M'),
                                 strptime(HADMEDT, '%d-%m-%Y %H:%M')) AS lc,
                        'HOSPAD' AS lt
                 FROM (SELECT DISTINCT Subject, HADMEDT, HADMSDT FROM HOSPAD)),
        dose AS (SELECT Subject AS subject,
                        strptime(IPDC_DAT, '%d-%m-%Y %H:%M') AS lc,
                        'DOSDISC' AS lt
                 FROM (SELECT DISTINCT Subject, IPDC_DAT FROM DOSEDISC
                       WHERE CAST(IP_DISC_STD AS INTEGER) = 1)),
        unioned AS (
          SELECT subject, lc, lt FROM hosp WHERE lc IS NOT NULL
          UNION ALL SELECT subject, lc, lt FROM dose WHERE lc IS NOT NULL
          UNION ALL SELECT subject, subject_death, 'Death' FROM sd
          UNION ALL SELECT subject, ltfu_date, 'Lost to follow up' FROM sl),
        mx AS (SELECT subject, MAX(lc) AS mx FROM unioned
               WHERE subject IS NOT NULL GROUP BY subject)
        SELECT m.subject, m.mx, list(DISTINCT u.lt) AS types
        FROM mx m JOIN unioned u ON u.subject = m.subject AND u.lc = m.mx
        GROUP BY m.subject, m.mx
    """).fetchall()
    want = {r[0]: (r[1], set(r[2])) for r in rows}
    assert set(got) == set(want)
    for subj, (dt, typ) in got.items():
        wdt, wtypes = want[subj]
        assert dt == wdt, (subj, dt, wdt)
        assert typ in wtypes, (subj, typ, wtypes)


def test_bronze_mode_matches_view_mode(spark, tmp_path_factory, study_run):
    """The same reference program run against the BRONZE store (nested
    (study_code, view) partitions, keyed reads → partition pruning) yields
    exactly the view-dir result — the full reference storage path."""
    from clinical_fixtures import generate

    from configurable_etl_python_repo_spark.config.excel import (
        bronze_resolver,
        parse_workbook,
    )
    from configurable_etl_python_repo_spark.sources.bronze import write_bronze

    eng_view, _, _ = study_run
    data_dir = str(tmp_path_factory.mktemp("clin2"))
    generate(data_dir)  # same seed → same data as study_run's fixtures
    bronze = str(tmp_path_factory.mktemp("bronze2")) + "/store"
    for v in ("DS", "DEATH"):
        write_bronze(spark.read.parquet(f"{data_dir}/{v}.parquet"), bronze,
                     study_code="DG001002003", view=v)
    plan = parse_workbook(f"{REF}/dg_test_subject_death_configuration.xlsx",
                          "subject_death", bronze_resolver(bronze))
    from configurable_etl_python_repo_spark.plans import Engine

    eng = Engine(spark)
    got = sorted(map(tuple, eng.run_analyte(plan).collect()))
    want = sorted(map(tuple,
                      eng_view.analyte_results["subject_death"].collect()))
    assert got == want


def test_standardized_output_shape(study_run):
    _, standardized, _ = study_run
    cols = set(standardized.columns)
    # spine + one value column per non-spine analyte
    assert {"country", "site", "subject", "subject_death", "ltfu_date",
            "last_contact_date", "last_contact_type", "subther_start_date",
            "concomitant", "all_ipdc_date", "pltfu_thresh",
            "pltfu_thresh_group"} <= cols
    assert standardized.count() > 0
