"""Data-quality / validation regime (SURVEY §5).

The reference's embedded validation queries as programmatic checks,
each returning (name, expected, actual):

1. row-count checks (`Members&EligibilitySource.sql:261-262`,
   DW dashboards `StarSchemaForHealthcare.sql:394-405`);
2. referential-integrity anti-joins expected empty
   (`ReferenceData.sql:214-230`);
3. Unknown-SK audits on facts (`StarSchemaForHealthcare.sql:408-422`);
4. constraint checks standing in for PK/UNIQUE (Spark doesn't enforce
   them): business-key uniqueness, composite-PK uniqueness, domain
   checks.

Anti-joins use left_anti (never collect-and-loop); uniqueness checks
are groupBy-count — everything distributes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CheckResult:
    name: str
    expected: int
    actual: int

    @property
    def ok(self) -> bool:
        return self.expected == self.actual


def _count(df: DataFrame) -> int:
    return df.count()


def fk_violations(child: DataFrame, parent: DataFrame, on, child_filter=None) -> DataFrame:
    """Rows of ``child`` whose key is absent from ``parent`` (expected
    empty; `ReferenceData.sql:214-230`)."""
    c = child if child_filter is None else child.filter(child_filter)
    return c.join(parent, on, "left_anti")


def duplicate_keys(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key groups violating PK/UNIQUE (expected empty)."""
    return df.groupBy(*cols).count().filter(F.col("count") > 1)


def run_checks(src: dict[str, DataFrame], dw: dict[str, DataFrame]) -> list[CheckResult]:
    out: list[CheckResult] = []

    def check(name: str, df: DataFrame, expected: int = 0):
        out.append(CheckResult(name, expected, _count(df)))

    # 2. referential integrity (expect 0)
    check(
        "claim_dx_in_icd_master",
        fk_violations(
            src["s2_claims_claim_diagnosis"], src["s5_ref_ref_icd10"], ["ICD10Code"]
        ),
    )
    check(
        "claim_proc_in_cpt_master",
        fk_violations(
            src["s2_claims_claim_procedure"], src["s5_ref_ref_cpt_hcpcs"], ["CPTCode"]
        ),
    )
    check(
        "claim_pos_in_pos_master",
        fk_violations(
            src["s2_claims_claim_header"],
            src["s5_ref_ref_pos"],
            ["POSCode"],
            F.col("POSCode").isNotNull(),
        ),
    )
    check(
        "claim_member_fk",
        fk_violations(src["s2_claims_claim_header"], src["s1_elig_member"], ["MemberID"]),
    )
    check(
        "enrollment_plan_fk",
        fk_violations(
            src["s1_elig_enrollment"], src["s1_elig_insurance_plan"], ["PlanID"]
        ),
    )
    check(
        "adjustment_code_in_master",
        fk_violations(
            src["s2_claims_claim_adjustment"].select(
                F.col("AdjGroupCode").alias("GroupCode"),
                F.col("AdjReasonCode").alias("ReasonCode"),
            ),
            src["s5_ref_ref_adjustment_code"],
            ["GroupCode", "ReasonCode"],
        ),
    )

    # 4. key uniqueness (expect 0 duplicate groups)
    check("member_bk_unique", duplicate_keys(src["s1_elig_member"], ["MemberBK"]))
    check(
        "enrollment_unique",
        duplicate_keys(
            src["s1_elig_enrollment"], ["MemberID", "PlanID", "EnrollmentMonth"]
        ),
    )
    check(
        "claim_line_pk",
        duplicate_keys(src["s2_claims_claim_line"], ["ClaimID", "ClaimLineNo"]),
    )
    check("provider_npi_unique", duplicate_keys(src["s4_provider_provider"], ["NPI"]))
    check(
        "contract_scope_exactly_one",
        src["s4_provider_contract"].filter(
            ~(
                (F.col("ContractScope") == "ORG")
                & F.col("OrgID").isNotNull()
                & F.col("ProviderID").isNull()
                | (F.col("ContractScope") == "PROVIDER")
                & F.col("ProviderID").isNotNull()
                & F.col("OrgID").isNull()
            )
        ),
    )

    # 1. fact grain counts match sources
    out.append(
        CheckResult(
            "fact_claims_line_grain",
            _count(src["s2_claims_claim_line"]),
            _count(dw["fact_claims_line"]),
        )
    )
    out.append(
        CheckResult(
            "fact_encounters_grain",
            _count(src["s2_claims_encounter"]),
            _count(dw["fact_encounters"]),
        )
    )
    out.append(
        CheckResult(
            "fact_care_gaps_grain",
            _count(src["s3_cca_care_gap"]),
            _count(dw["fact_care_gaps"]),
        )
    )
    out.append(
        CheckResult(
            "fact_elig_monthly_grain",
            _count(src["s1_elig_enrollment"]),
            _count(dw["fact_eligibility_monthly"]),
        )
    )

    # 3. Unknown-SK audits: members/plans always resolve in our fixtures
    check(
        "fact_claims_unknown_member",
        dw["fact_claims_line"].filter(F.col("MemberSK") == 0),
    )
    check(
        "fact_claims_unknown_plan",
        dw["fact_claims_line"].filter(F.col("PlanSK") == 0),
    )
    return out
