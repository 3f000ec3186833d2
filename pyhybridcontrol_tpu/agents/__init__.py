from pyhybridcontrol_tpu.agents.agent import Agent, ControlledAgent, MpcAgent

__all__ = ["Agent", "ControlledAgent", "MpcAgent"]
