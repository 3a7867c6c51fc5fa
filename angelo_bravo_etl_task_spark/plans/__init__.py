from .audit import assert_plan, physical_plan

__all__ = ["assert_plan", "physical_plan"]
