from .seen import SeenSetPool
from .politeness import HostBudgetPool
from .robots import RobotsCachePool, parse_robots

__all__ = ["SeenSetPool", "HostBudgetPool", "RobotsCachePool", "parse_robots"]
