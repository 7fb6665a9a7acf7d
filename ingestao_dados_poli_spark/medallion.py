"""The reference pipeline (banks/claims/employees → gold), re-expressed.

Reference flow (SURVEY §0): landing CSVs → bronze parquet (0a) → per-
dataset silver cleaning (etl/1, etl/2, etl/3) → gold join+aggregate
(etl/4). This module implements the same observable behavior as pure
DataFrame transforms wired into the declarative Pipeline, with the
reference's quirks (SURVEY §2.10) handled explicitly:

- compat mode reproduces the int-truncating 'índice' semantics
  (etl/4:54,79 — "0,25" → 0) ; corrected mode keeps doubles.
- name conforming is a shared rule table (string cleaning IS the join
  strategy — etl/4:50 joins on cleaned `nome`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ingestao_dados_poli_spark.functions import locale as L
from ingestao_dados_poli_spark.functions.cleaning import (
    align_union,
    apply_rules,
    derive_split_item,
    normalize_column_names,
    remap_values,
    rename_columns,
)

# Ordered conforming rules shared by all three datasets (etl/1:60-73,
# etl/2:63-77, etl/3:62-77). Order matters: strip " SA" only after the
# double-space fantasy-name separator is preserved.
NAME_RULES: tuple[tuple[str, str], ...] = (
    (r"(\.+|\/+|\-+)", ""),                                  # etl/1:62 punctuation
    (r" \(conglomerado\)", ""),                               # etl/2:66
    (r" PRUDENCIAL$", ""),                                    # etl/1:63 (dash already stripped)
    (r" INSTITUIÇÃO DE PAGAMENTO$", ""),                      # etl/1:65
    (r"SOCIEDADE DE CRÉDITO, FINANCIAMENTO E INVESTIMENTO", "SCFI"),  # etl/1:67
    (r" DEUTSCHE$", "DEUTSCHE BANK  BANCO ALEMAO"),           # etl/3:68
    (r"^BANCO SUMITOMO MITSUI BRASIL$", "BANCO SUMITOMO MITSUI BRASILEIRO"),  # etl/3:69
    (r" SA$", ""),                                            # etl/1:66
)

# Gold-stage exact remaps (etl/4:36-38 when+isin).
GOLD_NAME_REMAP = {
    "SF3 CRÉDITO": "SANTANA CRÉDITO",
    "SOCIAL BANK BANCO MÚLTIPLO": "BANCO CAPITAL",
}

# Canonical 24-column employee bronze order (0a:60).
EMPLOYEE_COLUMNS = [
    "employer_name", "reviews_count", "culture_count", "salaries_count",
    "benefits_count", "employer-website", "employer-headquarters",
    "employer-founded", "employer-industry", "employer-revenue", "url",
    "Geral", "Cultura e valores", "Diversidade e inclusão",
    "Qualidade de vida", "Alta liderança", "Remuneração e benefícios",
    "Oportunidades de carreira", "Recomendam para outras pessoas(%)",
    "Perspectiva positiva da empresa(%)", "CNPJ", "Segmento", "Nome",
    "match_percent",
]


def align_employee_variants(v1: DataFrame, v2: DataFrame) -> DataFrame:
    """Schema-drift union of the two employee CSV variants (0a:52-66).

    The reference pads each variant's missing column with lit('') and
    positionally unions; unionByName keeps the same observable result
    and survives column reorder. Missing columns are padded with ''
    (not NULL) to match the reference's lit('') exactly."""
    def pad(df: DataFrame) -> DataFrame:
        for c in EMPLOYEE_COLUMNS:
            if c not in df.columns:
                df = df.withColumn(c, F.lit(""))
        return df.select(*EMPLOYEE_COLUMNS)

    return align_union([pad(v1), pad(v2)])


def conform_name(df: DataFrame, col: str = "nome") -> DataFrame:
    """Apply the shared ordered rule fold to a name column — a single
    Project, CollapseProject merges all regexes into one codegen stage."""
    return df.withColumn(col, apply_rules(col, NAME_RULES))


def build_banks_silver(bronze: DataFrame) -> DataFrame:
    """etl/1-processing-banks.py:44-79 — normalize names, clean `nome`,
    derive `nome_fantasia` from the post-double-space segment (1:74)."""
    df = normalize_column_names(bronze)
    df = conform_name(df)
    df = derive_split_item(df, "nome", "nome_fantasia", sep="  ", index=1)
    return df


def build_claims_silver(bronze: DataFrame) -> DataFrame:
    """etl/2-processing-claims.py:44-82 — normalize headers (spaces/
    dashes→underscore, lower), targeted renames, clean `nome`."""
    df = normalize_column_names(bronze)
    # rename only when the source column exists AND the target doesn't —
    # renaming onto an existing column would create an ambiguous duplicate
    wanted = {"cnpj_if": "cnpj", "instituição_financeira": "nome"}
    mapping = {
        src: dst
        for src, dst in wanted.items()
        if src in df.columns and dst not in df.columns
    }
    if mapping:
        df = rename_columns(df, mapping)
    df = conform_name(df)
    return df


def build_employees_silver(bronze: DataFrame) -> DataFrame:
    """etl/3-processing-employees.py:44-83 — normalize names, clean
    `nome`, uppercase employer_name (3:78)."""
    df = normalize_column_names(bronze)
    df = conform_name(df)
    if "employer_name" in df.columns:
        df = df.withColumn("employer_name", F.upper("employer_name"))
    return df


def build_gold(
    banks: DataFrame,
    claims: DataFrame,
    employees: DataFrame,
    compat_int_index: bool = True,
) -> DataFrame:
    """etl/4-generate-final-table-gold.py:26-96 — the flagship query.

    claims ⋈ banks on cnpj (inner; banks is the small dim → broadcast),
    remap employee names (4:36-38), ⟕ employees on conformed nome,
    decimal-comma fix + cast (4:54,79), groupBy 3 keys + 5 avgs (4:84-91).

    ``compat_int_index=True`` reproduces the reference's int truncation
    of 'índice' before averaging (SURVEY §2.10); False keeps doubles.
    """
    b = F.broadcast(banks.select("cnpj", "segmento").alias("banks_df"))
    joined = claims.alias("claims_df").join(b, "cnpj", "inner")

    emp = remap_values(employees, "nome", GOLD_NAME_REMAP)
    emp = emp.select(
        F.col("nome"),
        L.safe_cast_double("geral").alias("satisfacao_geral"),
        L.safe_cast_double("remuneração_e_benefícios").alias("satisfacao_salarios"),
    )
    idx = (
        L.compat_int_index("índice").cast("double")
        if compat_int_index
        else L.parse_decimal_comma("índice")
    )
    enriched = joined.join(emp, "nome", "left").select(
        F.col("nome"),
        F.col("cnpj"),
        F.col("categoria"),
        idx.alias("indice"),
        L.safe_cast_double("quantidade_total_de_clientes_–_ccs_e_scr").alias("qtd_clientes"),
        L.safe_cast_double("quantidade_total_de_reclamações").alias("qtd_reclamacoes"),
        F.col("satisfacao_geral"),
        F.col("satisfacao_salarios"),
    )
    return (
        enriched.groupBy(
            F.col("nome").alias("Nome do Banco"),
            F.col("cnpj").alias("CNPJ"),
            F.col("categoria").alias("Classificação"),
        )
        .agg(
            F.round(F.avg("qtd_clientes")).alias("Quantidade de Clientes do Bancos"),
            F.avg("indice").alias("Índice de reclamações"),
            F.avg("qtd_reclamacoes").alias("Quantidade de reclamações"),
            F.avg("satisfacao_geral").alias("Índice de satisfação dos funcionários dos bancos"),
            F.avg("satisfacao_salarios").alias("Índice de satisfação com salários dos funcionários dos bancos"),
        )
    )
