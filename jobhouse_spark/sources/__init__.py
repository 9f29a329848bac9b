"""Sources & sinks: bronze raw layer, REST replay, multimodal binary."""
