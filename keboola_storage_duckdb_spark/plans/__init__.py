from .inspect import assert_broadcast_join, formatted_plan, plan_facts

__all__ = ["formatted_plan", "plan_facts", "assert_broadcast_join"]
