"""The three gold models, translated to the test corpus.

Reference models (dbt/models/gold/): monthly attrition rate
(gold_attrition_prototype.sql:16-26), per-department attrition
(gold_attrition_department_prototype.sql:14-27), and a summary
rollup over the monthly model (gold_attrition_summary.sql:3-11 —
note it reads the *monthly model's* output, i.e. a model-on-model
dependency). Domain mapping per SURVEY.md: order-status analytics
over ``orders``/``customer`` (status 'F' plays the attrition flag;
market segment plays department).
"""

from __future__ import annotations

from hr_moderndatapipeline_spark.plans.models import Model

GOLD_MONTHLY = Model(
    name="gold_status_monthly",
    sql="""
        SELECT CAST(year(o_orderdate) AS INT) AS year,
               CAST(month(o_orderdate) AS INT) AS month,
               count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS attrition_count,
               count(*) AS total_orders,
               COALESCE(CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS DOUBLE)
                        / NULLIF(CAST(count(*) AS DOUBLE), 0.0), 0.0) AS attrition_rate
        FROM orders
        GROUP BY 1, 2
    """,
    depends_on=("orders",),
)

GOLD_BY_SEGMENT = Model(
    name="gold_status_by_segment",
    sql="""
        SELECT c.c_mktsegment,
               CAST(year(o.o_orderdate) AS INT) AS year,
               count(CASE WHEN o.o_orderstatus = 'F' THEN 1 END) AS attrition_count,
               count(*) AS total_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_acctbal > 0
        GROUP BY 1, 2
    """,
    depends_on=("orders", "customer"),
)

GOLD_SUMMARY = Model(
    name="gold_status_summary",
    sql="""
        SELECT year,
               CAST(sum(attrition_count) AS BIGINT) AS attrition_count,
               CAST(sum(total_orders) AS BIGINT) AS total_orders,
               COALESCE(CAST(sum(attrition_count) AS DOUBLE)
                        / NULLIF(CAST(sum(total_orders) AS DOUBLE), 0.0), 0.0) AS attrition_rate
        FROM gold_status_monthly
        GROUP BY 1
    """,
    depends_on=("gold_status_monthly",),
)

GOLD_MODELS = (GOLD_SUMMARY, GOLD_MONTHLY, GOLD_BY_SEGMENT)  # deliberately unordered
