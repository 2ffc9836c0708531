"""Explicit StructType schemas for the healthcare source layer.

50 tables across 5 source domains, transcribed from the reference DDL
(cites per table group; see FIXTURES.md for domains/keys). Schema is
static/declared — never inferred — matching the reference's
CREATE TABLE discipline. PK/FK/UNIQUE constraints become data-quality
checks (plans/quality.py); Spark does not enforce them.

Type mapping (SURVEY §1.2): INT→Integer, BIGINT→Long, VARCHAR/CHAR→
String, DATE→Date, DECIMAL(p,s)→Decimal(p,s), BIT→Boolean.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DecimalType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def _schema(*cols: tuple) -> StructType:
    fields = []
    for name, typ, *rest in cols:
        nullable = rest[0] if rest else True
        fields.append(StructField(name, typ, nullable))
    return StructType(fields)


I = IntegerType()
S = StringType()
D = DateType()
B = BooleanType()


def MONEY():
    return DecimalType(12, 2)


def DEC9():
    return DecimalType(9, 2)


def DEC5():
    return DecimalType(5, 2)


# ---- Source 1: s1_elig (Members & Eligibility)
# `Members&EligibilitySource.sql:14-115`
S1_ELIG = {
    "member": _schema(
        ("MemberID", I, False), ("MemberBK", S, False), ("FirstName", S),
        ("LastName", S), ("DOB", D), ("Gender", S), ("SSN", S),
    ),
    "member_address": _schema(
        ("AddressID", I, False), ("MemberID", I, False), ("AddressLine1", S),
        ("AddressLine2", S), ("City", S), ("State", S), ("ZipCode", S),
    ),
    "member_contact": _schema(
        ("ContactID", I, False), ("MemberID", I, False), ("Phone", S), ("Email", S),
    ),
    "payer": _schema(
        ("PayerID", I, False), ("PayerName", S, False), ("PayerType", S),
    ),
    "insurance_plan": _schema(
        ("PlanID", I, False), ("PayerID", I, False), ("PlanName", S, False),
        ("PlanType", S), ("CoverageLevel", S),
    ),
    "enrollment": _schema(
        ("EnrollmentID", I, False), ("MemberID", I, False), ("PlanID", I, False),
        ("EnrollmentMonth", D, False), ("IsActive", B),
    ),
    "coverage_period": _schema(
        ("CoverageID", I, False), ("MemberID", I, False), ("PlanID", I, False),
        ("StartDate", D, False), ("EndDate", D),
    ),
    "dual_status": _schema(
        ("DualID", I, False), ("MemberID", I, False), ("StatusCode", S),
        ("EffectiveDate", D),
    ),
    "subsidy_lis": _schema(
        ("LISID", I, False), ("MemberID", I, False), ("SubsidyLevel", S),
        ("EffectiveDate", D),
    ),
    "member_language_pref": _schema(
        ("PrefID", I, False), ("MemberID", I, False), ("Language", S),
        ("EffectiveDate", D),
    ),
}

# ---- Source 2: s2_claims (Claims & Encounters)
# `Claims & Encounters.sql:9-128`
S2_CLAIMS = {
    "place_of_service": _schema(("POSCode", S, False), ("POSDescription", S)),
    "claim_header": _schema(
        ("ClaimID", I, False), ("ClaimNumber", S, False), ("MemberID", I, False),
        ("PlanID", I, False), ("ClaimDate", D, False),
        ("RenderingProviderNPI", S), ("POSCode", S), ("ClaimStatus", S),
    ),
    "claim_line": _schema(
        ("ClaimID", I, False), ("ClaimLineNo", I, False), ("ServiceDate", D),
        ("POSCode", S), ("Units", DEC9()), ("RevenueCode", S),
        ("BilledAmount", MONEY()), ("RenderingProviderNPI", S),
    ),
    "claim_diagnosis": _schema(
        ("ClaimID", I, False), ("DxSeq", I, False), ("ICD10Code", S, False),
    ),
    "claim_procedure": _schema(
        ("ClaimID", I, False), ("ClaimLineNo", I, False), ("ProcSeq", I, False),
        ("CPTCode", S, False), ("Modifier1", S), ("Modifier2", S),
    ),
    "claim_payment": _schema(
        ("PaymentID", I, False), ("ClaimID", I, False), ("ClaimLineNo", I, False),
        ("AllowedAmount", MONEY()), ("PaidAmount", MONEY()),
        ("PatientLiability", MONEY()), ("PaymentDate", D),
    ),
    "claim_adjustment": _schema(
        ("AdjustmentID", I, False), ("ClaimID", I, False), ("ClaimLineNo", I, False),
        ("AdjGroupCode", S), ("AdjReasonCode", S), ("AdjAmount", MONEY()),
        ("RemarkCode", S),
    ),
    "encounter": _schema(
        ("EncounterID", I, False), ("MemberID", I, False), ("PlanID", I, False),
        ("EncounterDate", D, False), ("EncounterType", S), ("AdmitDate", D),
        ("DischargeDate", D), ("FacilityPOSCode", S), ("ProviderNPI", S),
    ),
    "encounter_diagnosis": _schema(
        ("EncounterID", I, False), ("DxSeq", I, False), ("ICD10Code", S, False),
    ),
    "encounter_procedure": _schema(
        ("EncounterID", I, False), ("ProcSeq", I, False), ("CPTCode", S, False),
    ),
}

# ---- Source 3: s3_cca (Care Management)
# `CareManagementCCA.sql:10-120`
S3_CCA = {
    "quality_measure": _schema(
        ("MeasureID", S, False), ("MeasureName", S), ("Owner", S),
    ),
    "cca_user": _schema(("UserID", I, False), ("UserName", S), ("Role", S)),
    "care_program": _schema(
        ("ProgramID", I, False), ("ProgramName", S, False), ("Description", S),
    ),
    "care_plan": _schema(
        ("CarePlanID", I, False), ("MemberID", I, False), ("ProgramID", I, False),
        ("PlanID", I), ("StartDate", D, False), ("EndDate", D), ("Status", S),
        ("AssignedUserID", I),
    ),
    "care_goal": _schema(
        ("GoalID", I, False), ("CarePlanID", I, False), ("GoalText", S),
        ("TargetDate", D), ("Status", S),
    ),
    "care_task": _schema(
        ("TaskID", I, False), ("CarePlanID", I, False), ("GoalID", I),
        ("TaskText", S), ("DueDate", D), ("Status", S), ("AssignedUserID", I),
    ),
    "assessment": _schema(
        ("AssessmentID", I, False), ("MemberID", I, False), ("ProgramID", I),
        ("AssessmentDate", D, False), ("AssessmentType", S), ("Score", DEC9()),
        ("Notes", S),
    ),
    "risk_score": _schema(
        ("RiskID", I, False), ("MemberID", I, False), ("RiskModel", S),
        ("Score", DEC9()), ("RiskTier", S), ("EffectiveDate", D),
    ),
    "care_gap": _schema(
        ("GapID", I, False), ("MemberID", I, False), ("MeasureID", S, False),
        ("PeriodStart", D), ("PeriodEnd", D), ("Status", S), ("ClosedDate", D),
    ),
    "intervention": _schema(
        ("InterventionID", I, False), ("CarePlanID", I, False), ("TaskID", I),
        ("UserID", I), ("InterventionDate", D, False), ("InterventionType", S),
        ("MinutesSpent", I), ("Notes", S),
    ),
}

# ---- Source 4: s4_provider (Provider Network)
# `ProviderNetwork.sql:9-111`
S4_PROVIDER = {
    "organization": _schema(("OrgID", I, False), ("OrgName", S, False), ("TaxID", S)),
    "location": _schema(
        ("LocationID", I, False), ("OrgID", I, False), ("LocationName", S),
        ("AddressLine1", S), ("City", S), ("State", S), ("Zip", S),
    ),
    "provider": _schema(
        ("ProviderID", I, False), ("NPI", S, False), ("ProviderName", S),
        ("ProviderType", S), ("IsActive", B),
    ),
    "provider_location": _schema(
        ("ProviderID", I, False), ("LocationID", I, False), ("StartDate", D, False),
        ("EndDate", D),
    ),
    "specialty": _schema(("SpecialtyCode", S, False), ("SpecialtyName", S)),
    "provider_specialty": _schema(
        ("ProviderID", I, False), ("SpecialtyCode", S, False),
    ),
    "contract": _schema(
        ("ContractID", I, False), ("PayerID", I, False), ("PlanID", I),
        ("ContractName", S), ("EffectiveDate", D, False), ("EndDate", D),
        ("ContractScope", S), ("OrgID", I), ("ProviderID", I),
    ),
    "contract_rate": _schema(
        ("ContractID", I, False), ("CPTCode", S, False), ("EffectiveDate", D, False),
        ("AllowedAmount", MONEY()),
    ),
    "network_status": _schema(
        ("ProviderID", I, False), ("PlanID", I, False), ("Yyyymm", S, False),
        ("Status", S),
    ),
    "affiliation": _schema(
        ("ProviderID", I, False), ("OrgID", I, False), ("StartDate", D, False),
        ("EndDate", D),
    ),
}

# ---- Source 5: s5_ref (Reference Data)
# `ReferenceData.sql:9-92`
S5_REF = {
    "ref_icd10": _schema(
        ("ICD10Code", S, False), ("ShortDesc", S), ("Chapter", S), ("Category", S),
    ),
    "ref_cpt_hcpcs": _schema(
        ("CPTCode", S, False), ("ShortDesc", S), ("Category", S),
    ),
    "ref_pos": _schema(("POSCode", S, False), ("POSDescription", S)),
    "ref_ndc": _schema(
        ("NDC", S, False), ("Generic", S), ("Brand", S), ("Strength", S),
        ("DosageForm", S), ("Route", S),
    ),
    "ref_loinc": _schema(
        ("LOINCCode", S, False), ("Component", S), ("Property", S), ("Scale", S),
        ("Method", S), ("CommonName", S),
    ),
    "ref_quality_measure": _schema(
        ("MeasureID", S, False), ("MeasureName", S), ("Owner", S),
    ),
    "ref_benefit": _schema(
        ("BenefitID", I, False), ("BenefitName", S), ("BenefitType", S),
    ),
    "ref_plan_benefit": _schema(
        ("PlanID", I, False), ("BenefitID", I, False), ("Yyyymm", S, False),
        ("Copay", MONEY()), ("CoinsurancePct", DEC5()), ("LimitAmount", MONEY()),
    ),
    "ref_geo_zipfips": _schema(
        ("Zip", S, False), ("CountyFIPS", S), ("CountyName", S), ("State", S),
        ("Region", S),
    ),
    "ref_adjustment_code": _schema(
        ("GroupCode", S, False), ("ReasonCode", S, False), ("Description", S),
        ("IsRARC", B),
    ),
}

SOURCE_SCHEMAS: dict[str, dict[str, StructType]] = {
    "s1_elig": S1_ELIG,
    "s2_claims": S2_CLAIMS,
    "s3_cca": S3_CCA,
    "s4_provider": S4_PROVIDER,
    "s5_ref": S5_REF,
}


def flat_name(source: str, table: str) -> str:
    """Reference `schema.table` naming flattened for Spark temp views."""
    return f"{source}_{table}"


ALL_TABLES: dict[str, StructType] = {
    flat_name(src, tbl): schema
    for src, tables in SOURCE_SCHEMAS.items()
    for tbl, schema in tables.items()
}

assert len(ALL_TABLES) == 50, f"expected 50 source tables, got {len(ALL_TABLES)}"
