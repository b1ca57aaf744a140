from .gold import build_dim, build_fact_transactions
from .silver import stg_accounts, stg_customers, stg_transactions

__all__ = [
    "stg_customers",
    "stg_accounts",
    "stg_transactions",
    "build_dim",
    "build_fact_transactions",
]
