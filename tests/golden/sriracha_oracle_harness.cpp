// Live-oracle harness around the UNMODIFIED reference SriRachA per-read
// kernel (search_by_kmer.cpp). Loads subjects the way main.cpp:121-170
// does, drives every read of a local FASTA/FASTQ through search_by_kmer
// with 1-based read indices (subindex 1, the local-file convention), then
// applies the per-accession cull from main.cpp's search() and prints one
// line per surviving match:
//   subject_idx \t read_index \t read_subindex \t score(%a) \t seq
// Usage: harness k threshold complexity min_len min_valid max_match
//        subjects.fasta reads.fasta
#include "sriracha.h"
#include "word.h"
#include "sort.h"
#include "options.h"
#include "parse_sequence.h"

#include <cstdio>
#include <cstdlib>
#include <iostream>

using namespace std;

int mpi_rank = 0;
int mpi_numtasks = 1;

void search_by_kmer(const string &m_seq, const unsigned int &m_read_index,
                    const unsigned int &m_read_subindex, void* m_param[]);

int main(int argc, char** argv) {
  if (argc != 9) { fprintf(stderr, "args\n"); return 2; }
  SrirachaOptions opt;
  opt.kmer_len = (unsigned)atoi(argv[1]);
  opt.kmer_match_threshold = (float)atof(argv[2]);
  opt.min_read_complexity = (float)atof(argv[3]);
  opt.min_read_length = (unsigned)atoi(argv[4]);
  opt.min_valid_kmer = (unsigned)atoi(argv[5]);
  opt.max_num_match = (unsigned)atoi(argv[6]);
  opt.search_strategy = SEARCH_BY_KMER;
  opt.verbose = 0;

  deque< pair< string, deque<Word> > > subject_kmers;
  for (SequenceIterator it(argv[7]); it; ++it) {
    subject_kmers.push_back(make_pair(it.get_info(), deque<Word>()));
    deque<Word>& lk = subject_kmers.back().second;
    ForEachDuplexWord(it.get_seq(), opt.kmer_len)
      if (ValidWord) lk.push_back(CanonicalWord);
    EndWord
    SORT(lk.begin(), lk.end());
    lk.erase(unique(lk.begin(), lk.end()), lk.end());
    if (lk.empty()) subject_kmers.pop_back();
  }

  const size_t ns = subject_kmers.size();
  vector< deque<SearchMatch> > results(ns);
  vector<size_t> num_perfect(ns);
  void* param[] = {(void*)&results, (void*)&subject_kmers,
                   (void*)&num_perfect, (void*)&opt, NULL};
  unsigned int idx = 0;
  for (SequenceIterator it(argv[8]); it; ++it) {
    ++idx;
    search_by_kmer(it.get_seq(), idx, 1, param);
  }
  for (size_t s = 0; s < ns; ++s) {
    SORT(results[s].begin(), results[s].end());
    if (opt.max_num_match > 0 && results[s].size() > opt.max_num_match)
      results[s].resize(opt.max_num_match);
    for (deque<SearchMatch>::const_iterator m = results[s].begin();
         m != results[s].end(); ++m) {
      printf("%zu\t%u\t%u\t%a\t%s\n", s, m->read_index, m->read_subindex,
             (double)m->score, m->read_seq.c_str());
    }
  }
  return 0;
}
