"""Analytics plans: the dbt-style DAG and the flagship impact pipeline."""
