from .audit import audit_plan, explain_str

__all__ = ["audit_plan", "explain_str"]
