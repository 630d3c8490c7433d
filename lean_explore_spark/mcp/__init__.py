"""MCP (Model Context Protocol) stdio surface — reference entry point
B parity (src/lean_explore/mcp/: app.py + tools.py + server.py)."""
