"""graph_tool.topology.all_circuits — Johnson's elementary-circuit
enumeration (Johnson 1975), matching graph-tool's output convention:
each elementary circuit once, as a list of vertex indices starting at
its smallest vertex, circuits ordered by that starting vertex."""

from typing import List


def all_circuits(g, unique: bool = True) -> List[List[int]]:
    n = g.num_vertices()
    adj = [sorted(int(t) for t in g._out[s]) for s in range(n)]
    result: List[List[int]] = []

    for s in range(n):
        # subgraph induced on vertices >= s
        blocked = [False] * n
        blist = [set() for _ in range(n)]
        stack: List[int] = []

        def unblock(u):
            blocked[u] = False
            for w in list(blist[u]):
                blist[u].discard(w)
                if blocked[w]:
                    unblock(w)

        def circuit(v) -> bool:
            found = False
            stack.append(v)
            blocked[v] = True
            for w in adj[v]:
                if w < s:
                    continue
                if w == s:
                    result.append(stack.copy())
                    found = True
                elif not blocked[w]:
                    if circuit(w):
                        found = True
            if found:
                unblock(v)
            else:
                for w in adj[v]:
                    if w >= s:
                        blist[w].add(v)
            stack.pop()
            return found

        circuit(s)
    return result
