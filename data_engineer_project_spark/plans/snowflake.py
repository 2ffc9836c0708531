"""Snowflake-schema DW build: normalized dims + bridge.

Re-expresses `SnowflakeSchemaForHealthcare.sql`: parent dims load
before children (Payer→Plan :220-230, Org→Location :233-242,
Provider+Specialty→Bridge :245-265); Plan references PayerSK instead of
embedding payer attributes; Provider↔Specialty is a many-to-many
bridge. Code dims and the 4 facts are identical in shape to the star
build, so those are reused from plans.star (the facts join the snow
DimPlan, whose SKs match the star DimPlan by construction — both
number the same business keys in the same order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineer_project_spark.plans.star import (
    _sk,
    _with_unknown,
    build_dim_date,
    build_dim_diagnosis,
    build_dim_member,
    build_dim_pos,
    build_dim_procedure,
    build_dim_provider,
    build_dim_quality_measure,
    build_fact_care_gaps,
    build_fact_claims_line,
    build_fact_eligibility_monthly,
    build_fact_encounters,
)


def build_dim_payer(src) -> DataFrame:
    """DimPayer (:220-224) — the normalized parent of Plan."""
    p = _sk(src["s1_elig_payer"], ["PayerID"], "PayerSK").select(
        "PayerSK", "PayerID", "PayerName", "PayerType"
    )
    return _with_unknown(p, (0, -1, "Unknown", "UNK"))


def build_dim_plan_snow(src, dim_payer: DataFrame) -> DataFrame:
    """DimPlan referencing PayerSK (:226-230) — child loads after
    parent; missing payer falls back to SK=0."""
    plan = src["s1_elig_insurance_plan"].alias("pl")
    dp = F.broadcast(dim_payer.alias("py"))
    p = (
        plan.join(dp, F.col("py.PayerID") == F.col("pl.PayerID"), "left")
        .select(
            F.col("pl.PlanID").alias("PlanID"),
            F.col("pl.PlanName").alias("PlanName"),
            F.col("pl.PlanType").alias("PlanType"),
            F.coalesce(F.col("py.PayerSK"), F.lit(0)).alias("PayerSK"),
        )
    )
    p = _sk(p, ["PlanID"], "PlanSK").select(
        "PlanSK", "PlanID", "PlanName", "PlanType", "PayerSK"
    )
    return _with_unknown(p, (0, -1, "Unknown", "UNK", 0))


def build_dim_org(src) -> DataFrame:
    o = _sk(src["s4_provider_organization"], ["OrgID"], "OrgSK").select(
        "OrgSK", "OrgID", "OrgName", "TaxID"
    )
    return _with_unknown(o, (0, -1, "Unknown", None))


def build_dim_location(src, dim_org: DataFrame) -> DataFrame:
    """DimLocation under Org (:233-242): Org→Location hierarchy."""
    loc = src["s4_provider_location"].alias("lo")
    do = F.broadcast(dim_org.alias("og"))
    l = (
        loc.join(do, F.col("og.OrgID") == F.col("lo.OrgID"), "left")
        .select(
            F.col("lo.LocationID").alias("LocationID"),
            F.col("lo.LocationName").alias("LocationName"),
            F.col("lo.City").alias("City"),
            F.col("lo.State").alias("State"),
            F.col("lo.Zip").alias("Zip"),
            F.coalesce(F.col("og.OrgSK"), F.lit(0)).alias("OrgSK"),
        )
    )
    l = _sk(l, ["LocationID"], "LocationSK").select(
        "LocationSK", "LocationID", "LocationName", "City", "State", "Zip", "OrgSK"
    )
    return _with_unknown(l, (0, -1, "Unknown", None, None, None, 0))


def build_dim_specialty(src) -> DataFrame:
    s = _sk(src["s4_provider_specialty"], ["SpecialtyCode"], "SpecialtySK").select(
        "SpecialtySK", "SpecialtyCode", "SpecialtyName"
    )
    return _with_unknown(s, (0, "UNK", "Unknown"))


def build_bridge_provider_specialty(
    src, dim_provider: DataFrame, dim_specialty: DataFrame
) -> DataFrame:
    """BridgeProviderSpecialty (:258-265): many-to-many resolved to SK
    pairs; rows with unknown members keep SK=0 (never dropped)."""
    ps = src["s4_provider_provider_specialty"].alias("ps")
    prov = src["s4_provider_provider"].alias("pv")
    dp = F.broadcast(dim_provider.alias("dp"))
    ds = F.broadcast(dim_specialty.alias("ds"))
    return (
        ps.join(prov, F.col("pv.ProviderID") == F.col("ps.ProviderID"), "left")
        .join(dp, F.col("dp.NPI") == F.col("pv.NPI"), "left")
        .join(ds, F.col("ds.SpecialtyCode") == F.col("ps.SpecialtyCode"), "left")
        .select(
            F.coalesce(F.col("dp.ProviderSK"), F.lit(0)).alias("ProviderSK"),
            F.coalesce(F.col("ds.SpecialtySK"), F.lit(0)).alias("SpecialtySK"),
        )
        .distinct()
    )


def build_snowflake(src: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Full snowflake build in dependency order; facts reuse the star
    builders against the snow plan dim (SK-compatible)."""
    dim_payer = build_dim_payer(src)
    dim_org = build_dim_org(src)
    dim_provider = build_dim_provider(src)
    dim_specialty = build_dim_specialty(src)
    dims = {
        "dim_date": build_dim_date(src),
        "dim_member": build_dim_member(src),
        "dim_payer": dim_payer,
        "dim_plan": build_dim_plan_snow(src, dim_payer),
        "dim_org": dim_org,
        "dim_location": build_dim_location(src, dim_org),
        "dim_provider": dim_provider,
        "dim_specialty": dim_specialty,
        "dim_diagnosis": build_dim_diagnosis(src),
        "dim_procedure": build_dim_procedure(src),
        "dim_pos": build_dim_pos(src),
        "dim_quality_measure": build_dim_quality_measure(src),
        "bridge_provider_specialty": build_bridge_provider_specialty(
            src, dim_provider, dim_specialty
        ),
    }
    for d in dims.values():
        d.cache()
    facts = {
        "fact_claims_line": build_fact_claims_line(src, dims),
        "fact_encounters": build_fact_encounters(src, dims),
        "fact_care_gaps": build_fact_care_gaps(src, dims),
        "fact_eligibility_monthly": build_fact_eligibility_monthly(src, dims),
    }
    return {**dims, **facts}
