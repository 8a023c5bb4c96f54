"""End-to-end pipeline drivers replacing the reference's Airflow DAGs with
plain function composition over lazy DataFrame lineage (SURVEY.md §2.10:
the DAG structure IS the dataflow; no XCom-style materialized hand-offs)."""
