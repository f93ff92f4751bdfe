from .qnet import QNetwork, FactoredQ, init_qnet

__all__ = ["QNetwork", "FactoredQ", "init_qnet"]
