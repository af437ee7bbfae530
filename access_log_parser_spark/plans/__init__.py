from .routing import RouteRule, default_rules, route

__all__ = ["RouteRule", "default_rules", "route"]
