from duo_spark.plans.expr import user_predicate
from duo_spark.plans.query import Query

__all__ = ["Query", "user_predicate"]
