"""L4 streaming runtime: ring buffers, receiver FSM, chunk assembly."""
