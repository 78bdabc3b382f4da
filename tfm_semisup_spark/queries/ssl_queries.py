"""Semi-supervised-learning query entries (rows-only checked).

Placeholder module — populated as the SSC operators land (SelfTraining,
CoTraining, Supervised, CV grid). These are genuinely non-SQL ops
(iterative ML training), so no oracle_sql entries (driver contract:
rows-only check).
"""
