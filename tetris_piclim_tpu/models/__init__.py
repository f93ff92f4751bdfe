from .qnet import QNetwork, FactoredQ, JointQ, q_ops, init_qnet

__all__ = ["QNetwork", "FactoredQ", "JointQ", "q_ops", "init_qnet"]
