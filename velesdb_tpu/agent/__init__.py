"""Agent memory SDK (``velesdb-core/src/agent/`` counterpart, SURVEY.md §2.3)."""

from velesdb_tpu.agent.memory import AgentMemory, MemoryKind

__all__ = ["AgentMemory", "MemoryKind"]
