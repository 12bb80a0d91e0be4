// Native SMILES featurizer for aimnet_x2d_tpu.
//
// C++ implementation of the host-side featurization pipeline (same
// semantics as aimnet_x2d_tpu/chem/{smiles,featurize}.py, which is the
// executable specification — tests cross-validate the two on the QM9
// sample set).  Replaces the reference's native dependencies (RDKit C++
// for parsing, numba for BFS; reference: src/datasets/features.py) with
// first-party native code exposed through a plain C ABI for ctypes.
//
// Build:  make -C native        (produces libaimnet_featurizer.so)
//
// Threading: all entry points are reentrant and hold no global state, so
// Python can call them from a thread pool (ctypes releases the GIL).

#include <cstdint>
#include <cstdio>
#include <functional>
#include <cstring>
#include <algorithm>
#include <array>
#include <map>
#include <set>
#include <string>
#include <vector>

namespace {

// ----------------------------------------------------------------- tables

const char* ELEMENTS[] = {
    "H","He","Li","Be","B","C","N","O","F","Ne","Na","Mg","Al","Si","P","S",
    "Cl","Ar","K","Ca","Sc","Ti","V","Cr","Mn","Fe","Co","Ni","Cu","Zn","Ga",
    "Ge","As","Se","Br","Kr","Rb","Sr","Y","Zr","Nb","Mo","Tc","Ru","Rh","Pd",
    "Ag","Cd","In","Sn","Sb","Te","I","Xe","Cs","Ba","La","Ce","Pr","Nd","Pm",
    "Sm","Eu","Gd","Tb","Dy","Ho","Er","Tm","Yb","Lu","Hf","Ta","W","Re","Os",
    "Ir","Pt","Au","Hg","Tl","Pb","Bi","Po","At","Rn","Fr","Ra","Ac","Th","Pa",
    "U","Np","Pu","Am","Cm","Bk","Cf","Es","Fm","Md","No","Lr","Rf","Db","Sg",
    "Bh","Hs","Mt","Ds","Rg","Cn","Nh","Fl","Mc","Lv","Ts","Og"};
const int NUM_ELEMENTS = 118;

int symbol_to_z(const std::string& s) {
  for (int i = 0; i < NUM_ELEMENTS; ++i)
    if (s == ELEMENTS[i]) return i + 1;
  return 0;
}

// valence-electron count for main-group hybridization estimation
int valence_electrons(int z) {
  static const std::map<int, int> ve = {
      {1,1},{2,2},{3,1},{4,2},{5,3},{6,4},{7,5},{8,6},{9,7},{10,8},
      {11,1},{12,2},{13,3},{14,4},{15,5},{16,6},{17,7},{18,8},
      {19,1},{20,2},{31,3},{32,4},{33,5},{34,6},{35,7},{36,8},
      {37,1},{38,2},{49,3},{50,4},{51,5},{52,6},{53,7},{54,8}};
  auto it = ve.find(z);
  return it == ve.end() ? -1 : it->second;
}

bool default_valences(const std::string& sym, std::vector<int>* out) {
  if (sym == "B") *out = {3};
  else if (sym == "C") *out = {4};
  else if (sym == "N") *out = {3, 5};
  else if (sym == "O") *out = {2};
  else if (sym == "P") *out = {3, 5};
  else if (sym == "S") *out = {2, 4, 6};
  else if (sym == "F" || sym == "Cl" || sym == "Br" || sym == "I") *out = {1};
  else return false;
  return true;
}

// ----------------------------------------------------------------- model

struct Atom {
  int z = 0;
  bool aromatic = false;
  int charge = 0;
  int isotope = 0;
  int chiral = 0;     // 0 none, 1 @, 2 @@
  bool bracket = false;
  int explicit_h = 0; // bracket H count
  int implicit_h = 0;
  bool is_h = false;
  int total_h() const { return bracket ? explicit_h : implicit_h; }
};

struct Bond {
  int a1, a2;
  int order;       // 1..4 (post-kekulize)
  bool aromatic;
  int direction;   // +1 '/', -1 '\\' as written a1->a2
  int other(int i) const { return i == a1 ? a2 : a1; }
};

struct Mol {
  std::vector<Atom> atoms;
  std::vector<Bond> bonds;
  std::vector<std::vector<int>> adj;  // atom -> bond indices
  // per-atom neighbor order in SMILES convention (mirrors
  // chem/smiles.py::Molecule.sorder): preceding atom, bracket implicit-H
  // slot (-1 until add_hydrogens patches it), ring partners at digit
  // positions, then branch/chain neighbors as written
  std::vector<std::vector<int>> sorder;

  void build_adj() {
    adj.assign(atoms.size(), {});
    for (size_t b = 0; b < bonds.size(); ++b) {
      adj[bonds[b].a1].push_back((int)b);
      adj[bonds[b].a2].push_back((int)b);
    }
  }
  int bond_order_sum(int i) const {
    int s = 0;
    for (int b : adj[i]) s += bonds[b].order;
    return s;
  }
  std::vector<int> neighbors(int i) const {
    std::vector<int> out;
    for (int b : adj[i]) out.push_back(bonds[b].other(i));
    return out;
  }
};

// ----------------------------------------------------------------- parser

struct ParseError {};

struct RingOpen {
  int atom;
  char bond_char;  // 0 = none
  int direction;
  int sorder_pos;  // placeholder position in sorder[atom]
};

bool parse_bracket(const std::string& s, size_t* ip, Atom* atom) {
  size_t j = s.find(']', *ip);
  if (j == std::string::npos) return false;
  std::string body = s.substr(*ip + 1, j - *ip - 1);
  size_t k = 0;
  int isotope = 0;
  while (k < body.size() && isdigit(body[k])) isotope = isotope * 10 + (body[k++] - '0');

  std::string sym;
  bool aromatic = false;
  if (k < body.size() && isupper(body[k])) {
    if (k + 1 < body.size() && islower(body[k + 1]) &&
        symbol_to_z(body.substr(k, 2)) > 0) {
      sym = body.substr(k, 2); k += 2;
    } else { sym = body.substr(k, 1); k += 1; }
  } else if (k < body.size() && islower(body[k])) {
    if (body.substr(k, 2) == "se" || body.substr(k, 2) == "as") {
      sym = body.substr(k, 2); sym[0] = toupper(sym[0]); k += 2;
    } else { sym = std::string(1, toupper(body[k])); k += 1; }
    aromatic = true;
  } else return false;
  int z = symbol_to_z(sym);
  if (z == 0) return false;

  int chiral = 0;
  if (k < body.size() && body[k] == '@') {
    chiral = 1; ++k;
    if (k < body.size() && body[k] == '@') { chiral = 2; ++k; }
    for (const char* tag : {"TH1","TH2","AL1","AL2","SP1","SP2","SP3"}) {
      size_t L = strlen(tag);
      if (body.compare(k, L, tag) == 0) { k += L; break; }
    }
  }
  int h = 0;
  if (k < body.size() && body[k] == 'H') {
    ++k; h = 1; int n = 0;
    while (k < body.size() && isdigit(body[k])) n = n * 10 + (body[k++] - '0');
    if (n) h = n;
  }
  int charge = 0;
  while (k < body.size() && (body[k] == '+' || body[k] == '-')) {
    int sign = body[k] == '+' ? 1 : -1;
    ++k; int n = 0;
    while (k < body.size() && isdigit(body[k])) n = n * 10 + (body[k++] - '0');
    charge += sign * (n ? n : 1);
  }
  if (k < body.size() && body[k] == ':') {
    ++k;
    while (k < body.size() && isdigit(body[k])) ++k;
  }
  if (k != body.size()) return false;

  atom->z = z; atom->aromatic = aromatic; atom->charge = charge;
  atom->isotope = isotope; atom->chiral = chiral; atom->bracket = true;
  atom->explicit_h = h; atom->is_h = (z == 1);
  *ip = j + 1;
  return true;
}

int bond_order_of(char c) {
  switch (c) { case '-': return 1; case '=': return 2; case '#': return 3;
               case '$': return 4; case ':': return 1; }
  return 1;
}

bool kekulize(Mol* mol);
void assign_implicit_h(Mol* mol);

bool parse_smiles(const std::string& s, Mol* mol) {
  int prev = -1;
  std::vector<int> stack;
  std::map<int, RingOpen> rings;
  char pending = 0;
  size_t i = 0, n = s.size();

  auto attach = [&](int idx) {
    mol->sorder.resize(mol->atoms.size());
    if (prev >= 0) {
      int order = 1, dir = 0;
      bool arom = false;
      if (pending == '/' || pending == '\\') {
        dir = pending == '/' ? 1 : -1;
      } else if (pending) {
        order = bond_order_of(pending);
        arom = pending == ':';
      } else {
        arom = mol->atoms[prev].aromatic && mol->atoms[idx].aromatic;
      }
      mol->bonds.push_back({prev, idx, order, arom, dir});
      mol->sorder[prev].push_back(idx);
      mol->sorder[idx].push_back(prev);
    }
    if (mol->atoms[idx].bracket && mol->atoms[idx].explicit_h > 0)
      mol->sorder[idx].push_back(-1);  // implicit-H slot (OpenSMILES)
    prev = idx;
    pending = 0;
  };

  while (i < n) {
    char c = s[i];
    if (c == '[') {
      Atom a;
      if (!parse_bracket(s, &i, &a)) return false;
      mol->atoms.push_back(a);
      attach((int)mol->atoms.size() - 1);
    } else if (isalpha(c)) {
      std::string two = s.substr(i, 2);
      Atom a;
      if (two == "Cl" || two == "Br") {
        a.z = symbol_to_z(two); i += 2;
      } else if (isupper(c)) {
        std::string sym(1, c);
        static const char* organic[] = {"B","C","N","O","P","S","F","I"};
        bool ok = false;
        for (auto* o : organic) if (sym == o) ok = true;
        if (!ok) return false;
        a.z = symbol_to_z(sym); i += 1;
      } else {
        static const std::string arom = "bcnops";
        if (arom.find(c) == std::string::npos) return false;
        a.z = symbol_to_z(std::string(1, toupper(c)));
        a.aromatic = true; i += 1;
      }
      a.is_h = (a.z == 1);
      mol->atoms.push_back(a);
      attach((int)mol->atoms.size() - 1);
    } else if (strchr("-=#$:/\\", c)) {
      if (pending) return false;
      pending = c; ++i;
    } else if (c == '(') {
      stack.push_back(prev); ++i;
    } else if (c == ')') {
      if (stack.empty()) return false;
      prev = stack.back(); stack.pop_back(); ++i;
    } else if (c == '.') {
      prev = -1; pending = 0; ++i;
    } else if (isdigit(c) || c == '%') {
      if (prev < 0) return false;
      int num;
      if (c == '%') {
        if (i + 2 >= n || !isdigit(s[i+1]) || !isdigit(s[i+2])) return false;
        num = (s[i+1]-'0') * 10 + (s[i+2]-'0'); i += 3;
      } else { num = c - '0'; ++i; }
      int dir = pending == '/' ? 1 : (pending == '\\' ? -1 : 0);
      char bond_char = (pending && pending != '/' && pending != '\\') ? pending : 0;
      auto it = rings.find(num);
      if (it != rings.end()) {
        RingOpen ro = it->second;
        rings.erase(it);
        char ch = bond_char ? bond_char : ro.bond_char;
        if (bond_char && ro.bond_char && bond_char != ro.bond_char) return false;
        int order = 1, d = 0;
        bool arom = false;
        if (ch) { order = bond_order_of(ch); arom = ch == ':'; }
        else arom = mol->atoms[ro.atom].aromatic && mol->atoms[prev].aromatic;
        d = ro.direction ? ro.direction : (dir ? -dir : 0);
        mol->bonds.push_back({ro.atom, prev, order, arom, d});
        mol->sorder[ro.atom][ro.sorder_pos] = prev;
        mol->sorder[prev].push_back(ro.atom);
      } else {
        rings[num] = {prev, bond_char, dir, (int)mol->sorder[prev].size()};
        mol->sorder[prev].push_back(-2);  // patched at ring closure
      }
      pending = 0;
    } else if (c == ' ' || c == '\t') {
      break;
    } else return false;
  }
  if (!rings.empty() || !stack.empty() || pending || mol->atoms.empty()) return false;

  mol->build_adj();
  if (!kekulize(mol)) return false;
  assign_implicit_h(mol);
  return true;
}

// --------------------------------------------------------------- kekulize

bool kekulize(Mol* mol) {
  std::vector<int> needy;
  std::vector<bool> is_needy(mol->atoms.size(), false);
  for (size_t idx = 0; idx < mol->atoms.size(); ++idx) {
    const Atom& a = mol->atoms[idx];
    if (!a.aromatic) continue;
    bool has_multiple = false;
    for (int b : mol->adj[idx])
      if (mol->bonds[b].order >= 2 && !mol->bonds[b].aromatic) has_multiple = true;
    if (has_multiple) continue;
    std::string sym = ELEMENTS[a.z - 1];
    int n_conn = (int)mol->adj[idx].size() + (a.bracket ? a.total_h() : 0);
    bool need = false;
    if (sym == "C") need = (a.charge == 0);
    else if (sym == "N" || sym == "P") {
      if (a.bracket && a.explicit_h > 0) need = false;
      else if (a.charge == -1) need = false;
      else if (n_conn >= 3 && a.charge == 0) need = false;
      else need = true;
    } else if (sym == "O" || sym == "S" || sym == "Se") need = (a.charge == 1);
    if (need) { needy.push_back((int)idx); is_needy[idx] = true; }
  }
  if (needy.empty()) return true;

  std::vector<std::vector<std::pair<int,int>>> cand(mol->atoms.size());
  for (size_t b = 0; b < mol->bonds.size(); ++b) {
    const Bond& bd = mol->bonds[b];
    if (bd.aromatic && is_needy[bd.a1] && is_needy[bd.a2]) {
      cand[bd.a1].push_back({bd.a2, (int)b});
      cand[bd.a2].push_back({bd.a1, (int)b});
    }
  }
  std::sort(needy.begin(), needy.end(), [&](int a, int b) {
    return cand[a].size() < cand[b].size();
  });
  std::map<int,int> matched;
  std::vector<int> chosen;

  std::function<bool(size_t)> backtrack = [&](size_t pos) -> bool {
    while (pos < needy.size() && matched.count(needy[pos])) ++pos;
    if (pos == needy.size()) return true;
    int a = needy[pos];
    for (auto [nbr, b] : cand[a]) {
      if (!matched.count(nbr)) {
        matched[a] = nbr; matched[nbr] = a; chosen.push_back(b);
        if (backtrack(pos + 1)) return true;
        chosen.pop_back(); matched.erase(a); matched.erase(nbr);
      }
    }
    return false;
  };
  if (!backtrack(0)) return false;
  for (int b : chosen) mol->bonds[b].order = 2;
  return true;
}

void assign_implicit_h(Mol* mol) {
  for (size_t i = 0; i < mol->atoms.size(); ++i) {
    Atom& a = mol->atoms[i];
    if (a.bracket) { a.implicit_h = 0; continue; }
    std::vector<int> vals;
    if (!default_valences(ELEMENTS[a.z - 1], &vals)) { a.implicit_h = 0; continue; }
    int bsum = mol->bond_order_sum((int)i);
    a.implicit_h = 0;
    for (int v : vals)
      if (v >= bsum) { a.implicit_h = v - bsum; break; }
  }
}

Mol add_hydrogens(const Mol& in) {
  Mol out = in;
  size_t heavy = in.atoms.size();
  out.sorder.resize(heavy);
  for (size_t i = 0; i < heavy; ++i) {
    int nh = out.atoms[i].total_h();
    for (int k = 0; k < nh; ++k) {
      Atom h; h.z = 1; h.is_h = true;
      out.atoms.push_back(h);
      int hidx = (int)out.atoms.size() - 1;
      out.bonds.push_back({(int)i, hidx, 1, false, 0});
      auto& so = out.sorder[i];
      auto slot = std::find(so.begin(), so.end(), -1);
      if (slot != so.end()) *slot = hidx;  // bracket implicit-H position
      else so.push_back(hidx);
      out.sorder.push_back({(int)i});
    }
    out.atoms[i].explicit_h = 0;
    out.atoms[i].implicit_h = 0;
  }
  out.build_adj();
  return out;
}

int hybridization_idx(const Mol& mol, int idx) {
  // 0..5 = S,SP,SP2,SP3,SP3D,SP3D2; 6 = OOV
  const Atom& a = mol.atoms[idx];
  if (a.aromatic) return 2;
  int ve = valence_electrons(a.z);
  if (ve < 0) return 6;
  int sigma = (int)mol.adj[idx].size() + a.total_h();
  int bsum = mol.bond_order_sum(idx) + a.total_h();
  int lone = std::max(0, (ve - a.charge - bsum) / 2);
  int steric = sigma + lone;
  if (steric >= 1 && steric <= 6) return steric - 1;
  return 6;
}

// symmetry ranks via Morgan/WL refinement (mirrors chem/smiles.py)
std::vector<int> symmetry_ranks(const Mol& mol) {
  size_t n = mol.atoms.size();
  std::vector<long long> key(n);
  std::vector<int> rank(n);
  for (size_t i = 0; i < n; ++i) {
    const Atom& a = mol.atoms[i];
    key[i] = ((long long)a.z << 24) ^ ((long long)(a.charge + 8) << 18) ^
             ((long long)a.total_h() << 12) ^ ((long long)mol.adj[i].size() << 6) ^
             (a.aromatic ? 1 : 0);
  }
  auto compress = [&](std::vector<long long>& keys) {
    std::vector<long long> sorted = keys;
    std::sort(sorted.begin(), sorted.end());
    sorted.erase(std::unique(sorted.begin(), sorted.end()), sorted.end());
    for (size_t i = 0; i < n; ++i)
      rank[i] = (int)(std::lower_bound(sorted.begin(), sorted.end(), keys[i]) -
                      sorted.begin());
  };
  compress(key);
  for (size_t iter = 0; iter < n; ++iter) {
    std::vector<long long> nk(n);
    for (size_t i = 0; i < n; ++i) {
      std::vector<std::pair<int,int>> nbr;
      for (int b : mol.adj[i])
        nbr.push_back({rank[mol.bonds[b].other((int)i)], mol.bonds[b].order});
      std::sort(nbr.begin(), nbr.end());
      long long h = rank[i];
      for (auto& p : nbr) h = h * 1000003 + p.first * 31 + p.second;
      nk[i] = h;
    }
    std::vector<int> old = rank;
    compress(nk);
    if (rank == old) break;
  }
  return rank;
}

// ------------------------------------------------- canonical SMILES writer
// Exact mirror of chem/smiles.py::{canonical_ranks,write_canonical_smiles}:
// same invariants, refinement, tie-breaking, DFS order, digit allocation,
// stereo re-orientation, and directional-system flip — the cross-validation
// test asserts byte-identical strings from both implementations.

struct RefineKey {
  int r;
  std::vector<std::pair<int,int>> nb;
  bool operator<(const RefineKey& o) const {
    if (r != o.r) return r < o.r;
    return nb < o.nb;
  }
  bool operator==(const RefineKey& o) const { return r == o.r && nb == o.nb; }
};

template <typename K>
std::vector<int> compress_keys(const std::vector<K>& keys) {
  std::vector<K> sorted = keys;
  std::sort(sorted.begin(), sorted.end());
  sorted.erase(std::unique(sorted.begin(), sorted.end()), sorted.end());
  std::vector<int> rank(keys.size());
  for (size_t i = 0; i < keys.size(); ++i)
    rank[i] = (int)(std::lower_bound(sorted.begin(), sorted.end(), keys[i]) -
                    sorted.begin());
  return rank;
}

std::vector<int> refine_ranks(const Mol& mol, std::vector<int> ranks) {
  size_t n = mol.atoms.size();
  while (true) {
    std::vector<RefineKey> keys(n);
    for (size_t i = 0; i < n; ++i) {
      keys[i].r = ranks[i];
      for (int b : mol.adj[i])
        keys[i].nb.push_back({ranks[mol.bonds[b].other((int)i)],
                              mol.bonds[b].order});
      std::sort(keys[i].nb.begin(), keys[i].nb.end());
    }
    std::vector<int> next = compress_keys(keys);
    if (next == ranks) return ranks;
    ranks = std::move(next);
  }
}

std::vector<int> canonical_ranks(const Mol& mol) {
  size_t n = mol.atoms.size();
  std::vector<std::array<int,7>> init(n);
  for (size_t i = 0; i < n; ++i) {
    const Atom& a = mol.atoms[i];
    init[i] = {a.is_h ? 1 : 0, a.z, a.charge, a.total_h(),
               (int)mol.adj[i].size(), a.aromatic ? 1 : 0, a.isotope};
  }
  std::vector<int> ranks = refine_ranks(mol, compress_keys(init));
  while (true) {
    std::map<int,int> counts;
    for (int r : ranks) counts[r]++;
    int r0 = -1;
    for (auto& [r, c] : counts) if (c > 1) { r0 = r; break; }
    if (r0 < 0) break;
    int chosen = -1;
    for (size_t i = 0; i < n; ++i)
      if (ranks[i] == r0) { chosen = (int)i; break; }
    std::vector<std::pair<int,int>> keys(n);
    for (size_t i = 0; i < n; ++i)
      keys[i] = {ranks[i], (int)i == chosen ? 0 : 1};
    ranks = refine_ranks(mol, compress_keys(keys));
  }
  return ranks;
}

std::string bond_char_out(const Mol& mol, int bi, int u) {
  const Bond& b = mol.bonds[bi];
  if (b.direction) {
    int d = b.a1 == u ? b.direction : -b.direction;
    return d > 0 ? "/" : "\\";
  }
  if (b.aromatic) return "";
  if (b.order == 1 && mol.atoms[b.a1].aromatic && mol.atoms[b.a2].aromatic)
    return "-";
  switch (b.order) { case 2: return "="; case 3: return "#"; case 4: return "$"; }
  return "";
}

bool perm_parity_even(const std::vector<int>& src, const std::vector<int>& dst) {
  std::vector<int> perm;
  for (int x : dst)
    perm.push_back((int)(std::find(src.begin(), src.end(), x) - src.begin()));
  int inv = 0;
  for (size_t i = 0; i < perm.size(); ++i)
    for (size_t j = i + 1; j < perm.size(); ++j)
      if (perm[i] > perm[j]) ++inv;
  return inv % 2 == 0;
}

bool chiral_tag_is_stereogenic(const Mol& mol, int idx,
                               std::vector<int>* ranks_cache);  // below

// keep_chiral: per-atom flags from the cleanIt analog (null keeps all
// tags) — twin of chem/smiles.py::_atom_str.
std::string atom_str(const Mol& mol, int u, const std::vector<int>& out_order,
                     const std::vector<uint8_t>* keep_chiral = nullptr) {
  const Atom& a = mol.atoms[u];
  std::string sym = ELEMENTS[a.z - 1];
  if (a.aromatic) for (auto& c : sym) c = (char)tolower(c);
  std::string s = "[";
  if (a.isotope) s += std::to_string(a.isotope);
  s += sym;
  if (a.chiral && (!keep_chiral || (*keep_chiral)[u])) {
    const std::vector<int>& ref = mol.sorder[u];
    std::vector<int> rs = ref, os = out_order;
    std::sort(rs.begin(), rs.end());
    std::sort(os.begin(), os.end());
    if (ref.size() == 4 && out_order.size() == 4 && rs == os) {
      int tag = perm_parity_even(ref, out_order) ? a.chiral : 3 - a.chiral;
      s += tag == 1 ? "@" : "@@";
    }
  }
  if (a.total_h()) {
    s += "H";
    if (a.total_h() > 1) s += std::to_string(a.total_h());
  }
  if (a.charge) {
    s += a.charge > 0 ? "+" : "-";
    if (std::abs(a.charge) > 1) s += std::to_string(std::abs(a.charge));
  }
  return s + "]";
}

// directional systems: active marks + union-find (chem/smiles.py twin)
struct DirSystems {
  std::set<int> active;
  std::map<int,int> parent;
  int find(int x) {
    while (parent[x] != x) { parent[x] = parent[parent[x]]; x = parent[x]; }
    return x;
  }
};

DirSystems directional_systems(const Mol& mol) {
  DirSystems ds;
  std::map<int, std::vector<int>> dir_at;
  for (size_t bi = 0; bi < mol.bonds.size(); ++bi) {
    const Bond& b = mol.bonds[bi];
    if (b.order == 1 && b.direction) {
      dir_at[b.a1].push_back((int)bi);
      dir_at[b.a2].push_back((int)bi);
    }
  }
  auto uni = [&](int a, int b) {
    int ra = ds.find(a), rb = ds.find(b);
    if (ra != rb) ds.parent[std::max(ra, rb)] = std::min(ra, rb);
  };
  for (const Bond& b : mol.bonds) {
    if (b.order != 2 || b.aromatic) continue;
    auto i1 = dir_at.find(b.a1), i2 = dir_at.find(b.a2);
    if (i1 == dir_at.end() || i2 == dir_at.end()) continue;
    std::vector<int> grp = i1->second;
    grp.insert(grp.end(), i2->second.begin(), i2->second.end());
    for (int bi : grp) {
      ds.active.insert(bi);
      ds.parent.emplace(bi, bi);
    }
    for (size_t k = 1; k < grp.size(); ++k) uni(grp[0], grp[k]);
  }
  return ds;
}

struct FragWriter {
  const Mol& mol;
  const std::vector<int>& ranks;
  DirSystems& dsys;
  const std::vector<uint8_t>* keep_chiral = nullptr;
  std::map<int, std::vector<std::pair<int,int>>> children;  // u -> (v, bond)
  std::map<int, std::vector<int>> ring_open, ring_close;
  std::set<int> visited, done_bonds;
  // token stream: plain strings + directional placeholders (sys, char)
  struct Tok { std::string s; int sys = -1; char dchar = 0; };
  std::vector<Tok> out;
  std::map<int,int> digit_of;
  std::set<int> in_use;

  FragWriter(const Mol& m, const std::vector<int>& r, DirSystems& d)
      : mol(m), ranks(r), dsys(d) {}

  void discover(int u) {
    visited.insert(u);
    children[u];
    std::vector<std::pair<std::pair<int,int>, std::pair<int,int>>> nbrs;
    for (int bi : mol.adj[u]) {
      int v = mol.bonds[bi].other(u);
      nbrs.push_back({{ranks[v], bi}, {bi, v}});
    }
    std::sort(nbrs.begin(), nbrs.end());
    for (auto& [key, bv] : nbrs) {
      auto [bi, v] = bv;
      if (done_bonds.count(bi)) continue;
      done_bonds.insert(bi);
      if (visited.count(v)) {
        ring_close[u].push_back(bi);
        ring_open[v].push_back(bi);
      } else {
        children[u].push_back({v, bi});
        discover(v);
      }
    }
  }

  int take_digit() {
    int d = 1;
    while (in_use.count(d)) ++d;
    in_use.insert(d);
    return d;
  }

  static std::string digit_str(int d) {
    if (d < 10) return std::to_string(d);
    char buf[16];
    snprintf(buf, sizeof buf, "%%%02d", d);
    return buf;
  }

  void bond_tok(int bi, int u) {
    const Bond& b = mol.bonds[bi];
    if (b.direction) {
      if (dsys.active.count(bi)) {
        int d = b.a1 == u ? b.direction : -b.direction;
        Tok t; t.sys = dsys.find(bi); t.dchar = d > 0 ? '/' : '\\';
        out.push_back(t);
      }
      return;  // inactive marks dropped
    }
    out.push_back({bond_char_out(mol, bi, u)});
  }

  void emit(int u, int parent) {
    std::vector<int> order;
    if (parent >= 0) order.push_back(parent);
    for (int bi : ring_open[u]) order.push_back(mol.bonds[bi].other(u));
    for (int bi : ring_close[u]) order.push_back(mol.bonds[bi].other(u));
    for (auto& [v, bi] : children[u]) order.push_back(v);
    out.push_back({atom_str(mol, u, order, keep_chiral)});
    for (int bi : ring_open[u]) {
      digit_of[bi] = take_digit();
      out.push_back({digit_str(digit_of[bi])});
    }
    for (int bi : ring_close[u]) {
      int d = digit_of[bi];
      digit_of.erase(bi);
      in_use.erase(d);
      bond_tok(bi, u);
      out.push_back({digit_str(d)});
    }
    auto& ch = children[u];
    for (size_t k = 0; k < ch.size(); ++k) {
      bool last = k + 1 == ch.size();
      if (!last) out.push_back({"("});
      bond_tok(ch[k].second, u);
      emit(ch[k].first, u);
      if (!last) out.push_back({")"});
    }
  }

  std::string finish() {
    std::map<int,bool> flip;
    for (auto& t : out)
      if (t.sys >= 0 && !flip.count(t.sys)) flip[t.sys] = t.dchar == '\\';
    std::string s;
    for (auto& t : out) {
      if (t.sys >= 0)
        s += ((t.dchar == '/') == flip[t.sys]) ? '\\' : '/';
      else
        s += t.s;
    }
    return s;
  }
};

std::string write_canonical_smiles(const Mol& mol) {
  size_t n = mol.atoms.size();
  std::vector<int> ranks = canonical_ranks(mol);
  DirSystems dsys = directional_systems(mol);
  // cleanIt analog: drop tags on non-stereogenic atoms (twin of
  // chem/smiles.py::write_canonical_smiles).
  std::vector<uint8_t> keep_chiral(n, 0);
  {
    std::vector<int> ranks_cache;
    for (size_t i = 0; i < n; ++i)
      if (mol.atoms[i].chiral &&
          chiral_tag_is_stereogenic(mol, (int)i, &ranks_cache))
        keep_chiral[i] = 1;
  }
  std::vector<char> seen(n, 0);
  std::vector<size_t> by_rank(n);
  for (size_t i = 0; i < n; ++i) by_rank[i] = i;
  std::sort(by_rank.begin(), by_rank.end(),
            [&](size_t a, size_t b) { return ranks[a] < ranks[b]; });
  std::string result;
  bool first = true;
  for (size_t start : by_rank) {
    if (seen[start]) continue;
    std::vector<size_t> stack = {start};
    seen[start] = 1;
    while (!stack.empty()) {
      size_t u = stack.back(); stack.pop_back();
      for (int v : mol.neighbors((int)u))
        if (!seen[v]) { seen[v] = 1; stack.push_back(v); }
    }
    FragWriter fw(mol, ranks, dsys);
    fw.keep_chiral = &keep_chiral;
    fw.discover((int)start);
    fw.emit((int)start, -1);
    if (!first) result += ".";
    result += fw.finish();
    first = false;
  }
  return result;
}

// --------------------------------------------------------------- features

struct Features {
  int num_atoms = 0;
  std::vector<int32_t> atom_feats;       // (N,4): type,hcount,degree,hyb
  std::vector<int32_t> atomic_numbers;   // (N,)
  std::vector<std::vector<int32_t>> edges;  // per hop, flattened (2,E) row-major
  std::vector<int32_t> tet;              // (C,4)
  std::vector<int32_t> cis;              // (P,2)
  std::vector<int32_t> trans;            // (Q,2)
  int total_charge = 0;
  std::string processed_smiles;          // canonical explicit-H output
};

void multi_hop_edges(const Mol& mol, int max_hops, Features* out) {
  int n = (int)mol.atoms.size();
  std::vector<std::vector<int>> adj(n);
  for (int i = 0; i < n; ++i) adj[i] = mol.neighbors(i);
  std::vector<uint8_t> visited((size_t)n * n, 0);
  std::vector<std::pair<int,int>> frontier;
  out->edges.assign(max_hops, {});

  std::vector<std::pair<int,int>> hop1;
  for (int v = 0; v < n; ++v)
    for (int w : adj[v])
      if (!visited[(size_t)v * n + w]) {
        visited[(size_t)v * n + w] = 1;
        hop1.push_back({v, w});
      }
  // store row-major (2, E): row0 then row1
  {
    std::vector<int32_t> arr(2 * hop1.size());
    for (size_t e = 0; e < hop1.size(); ++e) {
      arr[e] = hop1[e].first;
      arr[hop1.size() + e] = hop1[e].second;
    }
    out->edges[0] = std::move(arr);
  }
  frontier = hop1;

  for (int hop = 1; hop < max_hops; ++hop) {
    std::vector<std::pair<int,int>> next;
    for (auto [u, v] : frontier)
      for (int w : adj[v])
        if (w != u && !visited[(size_t)u * n + w]) {
          visited[(size_t)u * n + w] = 1;
          next.push_back({u, w});
        }
    if (next.empty()) break;
    std::vector<int32_t> arr(2 * next.size());
    for (size_t e = 0; e < next.size(); ++e) {
      arr[e] = next[e].first;
      arr[next.size() + e] = next[e].second;
    }
    out->edges[hop] = std::move(arr);
    frontier = next;
  }
}

void double_bond_stereo(const Mol& mol, Features* out) {
  for (size_t bi = 0; bi < mol.bonds.size(); ++bi) {
    const Bond& bond = mol.bonds[bi];
    if (bond.order != 2 || bond.aromatic) continue;
    int a = bond.a1, b = bond.a2;
    auto directional = [&](int atom, int other, int* partner, int* sign) {
      for (int bj : mol.adj[atom]) {
        const Bond& nb = mol.bonds[bj];
        if (nb.order == 1 && nb.direction != 0) {
          int p = nb.other(atom);
          if (p == other) continue;
          *partner = p;
          *sign = (nb.a1 != atom) ? nb.direction : -nb.direction;
          return true;
        }
      }
      return false;
    };
    int x, sx, y, sy;
    if (!directional(a, b, &x, &sx) || !directional(b, a, &y, &sy)) continue;
    bool is_cis = (sx == sy);

    std::vector<int> start_nbrs, end_nbrs;
    for (int nb : mol.neighbors(a)) if (nb != b) start_nbrs.push_back(nb);
    for (int nb : mol.neighbors(b)) if (nb != a) end_nbrs.push_back(nb);
    std::vector<int> uniq = start_nbrs;
    uniq.insert(uniq.end(), end_nbrs.begin(), end_nbrs.end());
    std::sort(uniq.begin(), uniq.end());
    uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
    if (uniq.size() < 4) continue;

    auto lowest = [&](const std::vector<int>& cands, int high) {
      int best = -1, bz = 1 << 30;
      for (int c : cands)
        if (c != high && mol.atoms[c].z < bz) { best = c; bz = mol.atoms[c].z; }
      return best;
    };
    int s_low = lowest(start_nbrs, x), e_low = lowest(end_nbrs, y);
    if (s_low < 0 || e_low < 0) continue;

    int same[4][2] = {{x, y}, {s_low, e_low}, {y, x}, {e_low, s_low}};
    int cross[4][2] = {{x, e_low}, {s_low, y}, {e_low, x}, {y, s_low}};
    auto push = [](std::vector<int32_t>* v, int (*pairs)[2]) {
      for (int k = 0; k < 4; ++k) { v->push_back(pairs[k][0]); v->push_back(pairs[k][1]); }
    };
    if (is_cis) { push(&out->cis, same); push(&out->trans, cross); }
    else { push(&out->trans, same); push(&out->cis, cross); }
  }
}

// CIP hierarchical-digraph branch key (mirrors chem/smiles.py::_cip_key):
// phantom duplicate leaves at multiple bonds, duplicate leaves at ring
// closures, siblings order-canonicalized by sorting.  Serialized to a
// LENGTH-PREFIXED string (4-byte LE subtree size + z + iso16 + children)
// so the encoding is provably injective for every Z/isotope value — a
// plain delimiter scheme would collide with payload bytes 0x28/0x29
// (Z=40/41 Zr/Nb; ADVICE r4).  Any deterministic total order on the
// serializations canonicalizes siblings, so equality induces the same
// partition as the Python tuple form, which is all the pairwise-distinct
// test consumes.  Returns false past the node budget or the depth bound
// (both shared with the Python twin — callers fall back to symmetry
// ranks deterministically in both languages instead of Python raising
// RecursionError while C++ eats native stack).
constexpr int kCipNodeBudget = 65536;
constexpr int kCipMaxDepth = 512;  // == chem/smiles.py::_CIP_MAX_DEPTH

void cip_wrap(std::string* out, const std::string& body) {
  uint32_t len = (uint32_t)body.size();
  out->push_back((char)(len & 0xff));
  out->push_back((char)((len >> 8) & 0xff));
  out->push_back((char)((len >> 16) & 0xff));
  out->push_back((char)((len >> 24) & 0xff));
  out->append(body);
}

bool cip_key(const Mol& mol, int prev, int cur, std::vector<uint8_t>& mask,
             int& budget, std::string* out, int depth = 0) {
  if (++budget > kCipNodeBudget || depth > kCipMaxDepth) return false;
  const Atom& a = mol.atoms[cur];
  std::vector<std::string> children;
  for (int bi : mol.adj[cur]) {
    const Bond& b = mol.bonds[bi];
    int other = b.other(cur);
    std::string dup;
    {
      std::string dup_body;
      dup_body.push_back((char)mol.atoms[other].z);
      dup_body.push_back((char)0);
      dup_body.push_back((char)0);
      cip_wrap(&dup, dup_body);
    }
    for (int k = 1; k < b.order; ++k) children.push_back(dup);
    if (other == prev) continue;
    if (mask[other]) {
      children.push_back(dup);  // ring closure -> duplicate leaf
    } else {
      mask[cur] = 1;
      std::string sub;
      bool ok = cip_key(mol, cur, other, mask, budget, &sub, depth + 1);
      mask[cur] = 0;
      if (!ok) return false;
      children.push_back(std::move(sub));
    }
  }
  std::sort(children.begin(), children.end(), std::greater<std::string>());
  std::string body;
  body.push_back((char)a.z);
  body.push_back((char)(a.isotope & 0xff));
  body.push_back((char)((a.isotope >> 8) & 0xff));
  for (auto& c : children) body.append(c);
  cip_wrap(out, body);
  return true;
}

bool cip_neighbors_distinct(const Mol& mol, int idx,
                            const std::vector<int>& nbrs, bool* distinct) {
  std::vector<uint8_t> mask(mol.atoms.size(), 0);
  mask[idx] = 1;
  int budget = 0;
  std::vector<std::string> keys;
  for (int j : nbrs) {
    std::string k;
    if (!cip_key(mol, idx, j, mask, budget, &k)) return false;
    keys.push_back(std::move(k));
  }
  std::sort(keys.begin(), keys.end());
  *distinct = std::adjacent_find(keys.begin(), keys.end()) == keys.end();
  return true;
}

// AssignStereochemistry(cleanIt=True) analog (reference cleans bogus
// tags before FindMolChiralCenters; src/datasets/features.py:169-176):
// an assigned @/@@ tag survives only with four pairwise-distinct CIP
// branches.  Twin of chem/smiles.py::chiral_tag_is_stereogenic.
bool chiral_tag_is_stereogenic(const Mol& mol, int idx,
                               std::vector<int>* ranks_cache) {
  std::vector<int> nbrs = mol.neighbors(idx);
  if (nbrs.size() != 4) return false;
  bool distinct = false;
  if (!cip_neighbors_distinct(mol, idx, nbrs, &distinct)) {
    if (ranks_cache->empty()) *ranks_cache = symmetry_ranks(mol);
    std::vector<int> rs;
    for (int nb : nbrs) rs.push_back((*ranks_cache)[nb]);
    std::sort(rs.begin(), rs.end());
    distinct = std::unique(rs.begin(), rs.end()) == rs.end();
  }
  return distinct;
}

void chiral_centers(const Mol& mol, Features* out) {
  // Assigned tags get the cleanIt analog, so assigned and unassigned
  // atoms pass the SAME distinct-branches test (chem/featurize.py twin).
  std::vector<int> ranks;  // symmetry-rank fallback, computed lazily
  for (size_t i = 0; i < mol.atoms.size(); ++i) {
    if (mol.atoms[i].is_h) continue;
    std::vector<int> nbrs = mol.neighbors((int)i);
    if (nbrs.size() != 4) continue;
    bool center = false;
    if (!cip_neighbors_distinct(mol, (int)i, nbrs, &center)) {
      // digraph budget overflow -> global symmetry-rank approximation
      if (ranks.empty()) ranks = symmetry_ranks(mol);
      std::vector<int> rs;
      for (int nb : nbrs) rs.push_back(ranks[nb]);
      std::sort(rs.begin(), rs.end());
      center = std::unique(rs.begin(), rs.end()) == rs.end();
    }
    if (center)
      for (int nb : nbrs) out->tet.push_back(nb);
  }
}

Features* featurize(const std::string& smiles, int max_hops) {
  Mol mol0;
  if (!parse_smiles(smiles, &mol0)) return nullptr;
  Mol mol = add_hydrogens(mol0);

  auto* f = new Features();
  int n = (int)mol.atoms.size();
  f->num_atoms = n;
  f->atom_feats.resize((size_t)n * 4);
  f->atomic_numbers.resize(n);
  for (int i = 0; i < n; ++i) {
    const Atom& a = mol.atoms[i];
    f->atomic_numbers[i] = a.z;
    f->atom_feats[i * 4 + 0] = (a.z >= 1 && a.z <= 118) ? a.z - 1 : 118;
    int nh = 0;
    for (int nb : mol.neighbors(i)) if (mol.atoms[nb].is_h) ++nh;
    f->atom_feats[i * 4 + 1] = std::min(nh, 8);
    int deg = (int)mol.adj[i].size();
    f->atom_feats[i * 4 + 2] = deg < 6 ? deg : 6;
    f->atom_feats[i * 4 + 3] = hybridization_idx(mol, i);
    f->total_charge += a.charge;
  }
  multi_hop_edges(mol, max_hops, f);
  double_bond_stereo(mol, f);
  chiral_centers(mol, f);
  // processed canonical SMILES (explicit-H, isomeric) — reference stores
  // MolToSmiles(AddHs(mol), isomericSmiles=True, allHsExplicit=True)
  // (src/datasets/features.py:173,333)
  f->processed_smiles = write_canonical_smiles(mol);
  return f;
}

}  // namespace

// ------------------------------------------------------------------ C ABI

extern "C" {

void* aimnet_featurize(const char* smiles, int max_hops) {
  try {
    return featurize(smiles, max_hops);
  } catch (...) {
    return nullptr;
  }
}

void aimnet_free(void* h) { delete static_cast<Features*>(h); }

int aimnet_num_atoms(void* h) { return static_cast<Features*>(h)->num_atoms; }
const int32_t* aimnet_atom_features(void* h) {
  return static_cast<Features*>(h)->atom_feats.data();
}
const int32_t* aimnet_atomic_numbers(void* h) {
  return static_cast<Features*>(h)->atomic_numbers.data();
}
int aimnet_total_charge(void* h) { return static_cast<Features*>(h)->total_charge; }

int aimnet_num_edges(void* h, int hop) {
  auto* f = static_cast<Features*>(h);
  if (hop >= (int)f->edges.size()) return 0;
  return (int)(f->edges[hop].size() / 2);
}
const int32_t* aimnet_edges(void* h, int hop) {
  auto* f = static_cast<Features*>(h);
  if (hop >= (int)f->edges.size()) return nullptr;
  return f->edges[hop].data();
}

int aimnet_num_tet(void* h) { return (int)(static_cast<Features*>(h)->tet.size() / 4); }
const int32_t* aimnet_tet(void* h) { return static_cast<Features*>(h)->tet.data(); }
int aimnet_num_cis(void* h) { return (int)(static_cast<Features*>(h)->cis.size() / 2); }
const int32_t* aimnet_cis(void* h) { return static_cast<Features*>(h)->cis.data(); }
int aimnet_num_trans(void* h) { return (int)(static_cast<Features*>(h)->trans.size() / 2); }
const int32_t* aimnet_trans(void* h) { return static_cast<Features*>(h)->trans.data(); }
const char* aimnet_smiles(void* h) {
  return static_cast<Features*>(h)->processed_smiles.c_str();
}

}  // extern "C"

// ----------------------------------------------------------- batch C ABI

#include <thread>
#include <atomic>

namespace {

struct BatchResult {
  int n = 0;
  int max_hops = 0;
  std::vector<uint8_t> valid;           // (n,)
  std::vector<int64_t> atom_offsets;    // (n+1,)
  std::vector<int32_t> atom_feats;      // (total_atoms, 4) row-major
  std::vector<int32_t> atomic_numbers;  // (total_atoms,)
  std::vector<int64_t> edge_offsets;    // (n+1,)
  std::vector<int32_t> edge_dst, edge_src;
  std::vector<int8_t> edge_hop;
  std::vector<int64_t> tet_offsets;     // (n+1,) rows of 4
  std::vector<int32_t> tet;
  std::vector<int64_t> cis_offsets, trans_offsets;  // rows of 2
  std::vector<int32_t> cis, trans;
  std::vector<int32_t> total_charge;    // (n,)
  std::vector<std::string> smiles;      // (n,) processed canonical SMILES
};

}  // namespace

extern "C" {

void* aimnet_featurize_batch(const char** smiles, int n, int max_hops,
                             int num_threads) {
  std::vector<Features*> feats(n, nullptr);
  if (num_threads < 1) num_threads = 1;
  std::vector<std::thread> pool;
  std::atomic<int> next{0};
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      feats[i] = featurize(smiles[i], max_hops);
    }
  };
  for (int t = 0; t < num_threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();

  auto* r = new BatchResult();
  r->n = n;
  r->max_hops = max_hops;
  r->valid.resize(n);
  r->atom_offsets.assign(1, 0);
  r->edge_offsets.assign(1, 0);
  r->tet_offsets.assign(1, 0);
  r->cis_offsets.assign(1, 0);
  r->trans_offsets.assign(1, 0);
  r->total_charge.resize(n, 0);

  for (int i = 0; i < n; ++i) {
    Features* f = feats[i];
    r->valid[i] = f != nullptr;
    if (f) {
      r->atom_feats.insert(r->atom_feats.end(), f->atom_feats.begin(),
                           f->atom_feats.end());
      r->atomic_numbers.insert(r->atomic_numbers.end(),
                               f->atomic_numbers.begin(), f->atomic_numbers.end());
      for (int hop = 0; hop < (int)f->edges.size(); ++hop) {
        size_t e = f->edges[hop].size() / 2;
        const int32_t* arr = f->edges[hop].data();
        for (size_t k = 0; k < e; ++k) {
          r->edge_dst.push_back(arr[k]);
          r->edge_src.push_back(arr[e + k]);
          r->edge_hop.push_back((int8_t)(hop + 1));
        }
      }
      r->tet.insert(r->tet.end(), f->tet.begin(), f->tet.end());
      r->cis.insert(r->cis.end(), f->cis.begin(), f->cis.end());
      r->trans.insert(r->trans.end(), f->trans.begin(), f->trans.end());
      r->total_charge[i] = f->total_charge;
      r->smiles.push_back(std::move(f->processed_smiles));
      delete f;
    } else {
      r->smiles.emplace_back();
    }
    r->atom_offsets.push_back((int64_t)r->atomic_numbers.size());
    r->edge_offsets.push_back((int64_t)r->edge_dst.size());
    r->tet_offsets.push_back((int64_t)(r->tet.size() / 4));
    r->cis_offsets.push_back((int64_t)(r->cis.size() / 2));
    r->trans_offsets.push_back((int64_t)(r->trans.size() / 2));
  }
  return r;
}

void aimnet_batch_free(void* h) { delete static_cast<BatchResult*>(h); }

#define BR static_cast<BatchResult*>(h)
const uint8_t* aimnet_batch_valid(void* h) { return BR->valid.data(); }
const int64_t* aimnet_batch_atom_offsets(void* h) { return BR->atom_offsets.data(); }
const int32_t* aimnet_batch_atom_features(void* h) { return BR->atom_feats.data(); }
const int32_t* aimnet_batch_atomic_numbers(void* h) { return BR->atomic_numbers.data(); }
const int64_t* aimnet_batch_edge_offsets(void* h) { return BR->edge_offsets.data(); }
const int32_t* aimnet_batch_edge_dst(void* h) { return BR->edge_dst.data(); }
const int32_t* aimnet_batch_edge_src(void* h) { return BR->edge_src.data(); }
const int8_t* aimnet_batch_edge_hop(void* h) { return BR->edge_hop.data(); }
const int64_t* aimnet_batch_tet_offsets(void* h) { return BR->tet_offsets.data(); }
const int32_t* aimnet_batch_tet(void* h) { return BR->tet.data(); }
const int64_t* aimnet_batch_cis_offsets(void* h) { return BR->cis_offsets.data(); }
const int32_t* aimnet_batch_cis(void* h) { return BR->cis.data(); }
const int64_t* aimnet_batch_trans_offsets(void* h) { return BR->trans_offsets.data(); }
const int32_t* aimnet_batch_trans(void* h) { return BR->trans.data(); }
const int32_t* aimnet_batch_total_charge(void* h) { return BR->total_charge.data(); }
const char* aimnet_batch_smiles(void* h, int i) { return BR->smiles[i].c_str(); }
#undef BR

}  // extern "C"
