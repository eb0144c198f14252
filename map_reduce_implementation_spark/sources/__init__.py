from .tables import TABLES, invalidate, register_views, table

__all__ = ["TABLES", "table", "register_views", "invalidate"]
