from .catalog import QUERIES, QuerySpec, oracle_map, query_map, register

__all__ = ["QUERIES", "QuerySpec", "oracle_map", "query_map", "register"]
